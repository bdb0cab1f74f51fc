"""Property-based tests: condition-code lattice algebra (exhaustive
over the valid-code domain + hypothesis pairs) and sessionization vs a
pure-Python reference on random event streams."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from rdfind_spark import condition_codes as cc


# ------------------------------------------------ code lattice algebra


def test_every_binary_code_has_two_valid_unary_generalizations():
    for code in cc.VALID_BINARY_CODES:
        gens = cc.generalizations(code)
        assert len(gens) == 2
        kept = {vi for _, vi in gens}
        assert kept == {1, 2}
        for gcode, _ in gens:
            assert gcode in cc.VALID_UNARY_CODES
            assert cc.is_subcode(gcode, code)
        # merging the two generalizations reconstructs the binary code
        assert cc.merge_codes(gens[0][0], gens[1][0]) == code


def test_unary_codes_have_no_generalizations():
    for code in cc.VALID_UNARY_CODES:
        assert cc.generalizations(code) == []


@given(
    st.sampled_from(sorted(cc.VALID_CODES)),
    st.sampled_from(sorted(cc.VALID_CODES)),
    st.sampled_from(sorted(cc.VALID_CODES)),
)
def test_subcode_is_a_partial_order(a, b, c):
    assert cc.is_subcode(a, a)
    if cc.is_subcode(a, b) and cc.is_subcode(b, a):
        assert a == b
    if cc.is_subcode(a, b) and cc.is_subcode(b, c):
        assert cc.is_subcode(a, c)


@given(
    st.sampled_from(sorted(cc.VALID_CODES)),
    st.text(alphabet="abc", min_size=1, max_size=2),
    st.text(alphabet="abc", min_size=1, max_size=2),
)
def test_capture_implies_is_reflexive_and_needs_subcode(code, v1, v2):
    v2 = v2 if cc.is_binary_condition(code) else ""
    assert cc.capture_implies(code, v1, v2, code, v1, v2)
    for ref in sorted(cc.VALID_CODES):
        if not cc.is_subcode(ref, code):
            assert not cc.capture_implies(code, v1, v2, ref, v1, v2)


# --------------------------------------------------- sessionize model


def _sessions_reference(events, gap_s):
    """Pure-Python gap sessionizer: events = [(user, t_seconds)]."""
    out = {}
    by_user = {}
    for u, t in sorted(events):
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        sessions = []
        for t in ts:
            if sessions and t - sessions[-1][-1] <= gap_s:
                sessions[-1].append(t)
            else:
                sessions.append([t])
        out[u] = [
            (len(s), min(s), max(s)) for s in sessions
        ]
    return out


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.integers(min_value=0, max_value=7200),
        ),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_sessionize_matches_python_reference(spark, events):
    from rdfind_spark.functions.events import sessionize

    gap_min = 30
    df = spark.createDataFrame(
        [(i, u, t) for i, (u, t) in enumerate(events)],
        "event_id long, user_id long, off long",
    ).select(
        "event_id",
        "user_id",
        (
            F.lit("2024-03-01 00:00:00").cast("timestamp").cast("long")
            + F.col("off")
        )
        .cast("timestamp")
        .alias("ts"),
    )
    got = {}
    for r in sessionize(df, gap_min).collect():
        got.setdefault(r["user_id"], []).append(
            (r["n_events"], r["session_start"], r["session_end"])
        )
    ref = _sessions_reference(events, gap_min * 60)
    assert set(got) == set(ref)
    for u, sess in ref.items():
        # compare per-session (n_events, start offset, duration) with all
        # offsets taken relative to the user's earliest session start via
        # timedelta arithmetic (timezone-independent)
        first = min(s for _, s, _ in got[u])
        norm = sorted(
            (n, int((s - first).total_seconds()), int((e - s).total_seconds()))
            for n, s, e in got[u]
        )
        ref_first = min(start for _, start, _ in sess)
        ref_norm = sorted(
            (n, start - ref_first, end - start) for n, start, end in sess
        )
        assert norm == ref_norm, (u, norm, ref_norm)


# ------------------------------------------------------ BPE vocab model


def _bpe_merge_tokens(toks, left, right):
    """Canonical greedy merge application: scan left to right, merge
    every (left, right) adjacency, skip past the merged token."""
    out, i = [], 0
    while i < len(toks):
        if i + 1 < len(toks) and toks[i] == left and toks[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _bpe_reference(words, n_merges):
    """Pure-Python model of canonical (Sennrich-style) BPE training:
    pair census weighted by word frequency (overlapping adjacencies all
    counted), argmax with (count DESC, pair ASC) tie-break, merge
    applied as a left-to-right greedy token scan — deliberately NOT the
    string-replace trick the engine uses, so the test is an independent
    derivation of the same semantics."""
    from collections import Counter

    freq = Counter(words)
    sym = {w: list(w) for w in freq}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for w, f in freq.items():
            toks = sym[w]
            for i in range(len(toks) - 1):
                pairs[toks[i] + " " + toks[i + 1]] += f
        if not pairs:
            break
        pr, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        left, right = pr.split(" ")
        merges.append((rank, left, right, cnt))
        for w in sym:
            sym[w] = _bpe_merge_tokens(sym[w], left, right)
    return merges


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_vocab_matches_python_reference(spark, words):
    from rdfind_spark.functions import corpus_stats

    df = spark.createDataFrame(
        [(0, " ".join(words), "en", "web", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in corpus_stats.bpe_vocab(df, n_merges=4).collect()
    ]
    assert got == _bpe_reference(words, 4)


# -------------------------------------------- random projection model


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-2.0,
            max_value=2.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=64,
        max_size=64,
    )
)
def test_rp_reduce_matches_integer_reference(spark, vec):
    import math

    from rdfind_spark.functions import similarity

    df = spark.createDataFrame(
        [(1, vec, 0)], "vec_id long, embedding array<double>, label int"
    )
    got = {
        r.rp_dim: r.rp_value for r in similarity.rp_reduce(df).collect()
    }
    q = [math.floor(x * similarity.RP_SCALE) for x in vec]
    mat = similarity._rp_matrix()
    for j in range(similarity.RP_OUT_DIM):
        assert got[j] == sum(s * v for s, v in zip(mat[j], q))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find_reference(spark, raw_edges):
    """The pointer-jumping components loop must agree with a plain
    Python union-find on arbitrary small graphs (self-loops and
    duplicate edges included): same partition into components, each
    labeled by its minimum node id."""
    from rdfind_spark.functions.dedup import _min_label_components

    edges = [(a, b) for a, b in raw_edges if a != b]
    if not edges:
        return
    sym = edges + [(b, a) for a, b in edges]
    df = spark.createDataFrame(sym, ["a_id", "b_id"]).distinct()
    labels, _ = _min_label_components(df)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for a, b in edges:
        union(a, b)
    want = {n: find(n) for n in parent}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters="\n\r",
                blacklist_categories=("Cs",),
            ),
            max_size=30,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_ntriples_literal_round_trip_property(spark, objs):
    """serialize->parse must be the identity on ARBITRARY literal
    values (any unicode except raw newlines, which the line-based
    format forbids unescaped): the adversarial fixed vectors in
    test_text_ingest_e2e generalize to hypothesis-found shapes —
    especially backslash runs adjacent to quotes, where a wrong
    unescape order corrupts silently."""
    from rdfind_spark.sources.sinks import ntriples_lines
    from rdfind_spark.sources.triples import _parsed_quads

    df = spark.createDataFrame(
        [("s", "p", o) for o in objs],
        "subj string, pred string, obj string",
    )
    back = [r.obj for r in _parsed_quads(ntriples_lines(df)).collect()]
    assert back == objs


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**12),
    st.integers(min_value=1, max_value=10**13),
    st.integers(min_value=1, max_value=10**13),
)
def test_cos2_ppm_matches_python_bigints(dot, a_n2, b_n2):
    """The widened cos^2-ppm expression must equal exact Python integer
    arithmetic across the whole physical range, including far past the
    int64 cliff of the narrow form (dot > ~3.03e6).  The generator
    enforces the Cauchy-Schwarz contract the real query guarantees —
    dot^2 <= a_n2 * b_n2, hence quotient <= 1e6 — which is exactly
    what makes the final BIGINT cast safe (hypothesis found the
    out-of-contract overflow when this clamp was missing).  Evaluated
    through DuckDB (no Spark session per example — the Spark twin is
    pinned on fixed vectors in test_functions.py; both render the same
    formula)."""
    import math

    import duckdb

    from rdfind_spark.functions.dedup import _cos2_ppm_sql

    dot = min(dot, math.isqrt(a_n2 * b_n2))
    got = duckdb.sql(
        f"SELECT {_cos2_ppm_sql(str(dot), str(a_n2), str(b_n2))}"
    ).fetchone()[0]
    assert got == (dot * dot * 1_000_000) // (a_n2 * b_n2)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=14),
        ),
        min_size=4,
        max_size=50,
    ),
    st.integers(min_value=2, max_value=4),
)
def test_k_core_matches_python_peel_reference(spark, raw_edges, k):
    """The Spark restrict-peel must agree with a plain Python peel on
    arbitrary small graphs (duplicate edges and self-loops included in
    the raw input; self-loops are dropped like entity_edges' distinct
    symmetrization drops nothing but parallel duplicates): same core
    membership, same within-core degrees."""
    from rdfind_spark.functions.graph import k_core

    edges = sorted({(a, b) for a, b in raw_edges if a != b})
    if not edges:
        return
    triples = spark.createDataFrame(
        [(f"n:{a}", "linksTo", f"n:{b}") for a, b in edges],
        "subj string, pred string, obj string",
    )
    got = {r.node: r.core_degree for r in k_core(triples, k=k).collect()}

    # python reference: adjacency over the symmetrized simple graph
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    want = {f"n:{v}": len(adj[v] & alive) for v in alive}
    assert got == want


def _model_parse_nt_line(line: str):
    """Independent third-engine model of the N-Triples subset the
    engine emits (round-9 verdict task 7): a character-scan parser
    written straight off the W3C grammar -- IRIREF, IRIREF, quoted
    STRING_LITERAL_QUOTE, '.' -- sharing NO code or regex machinery
    with either the Spark serializer (ordered regexp_replace escapes)
    or the Spark parser (regexp_extract + ordered unescape), so a
    shared-bug inverse pair cannot fool it.  Escape semantics match
    the engine's documented choice: decode \\" and \\\\, keep other
    ECHAR pairs (\\n, \\t, ...) verbatim as two characters."""
    s = line.strip()
    assert s.endswith("."), line
    s = s[:-1].rstrip()
    assert s.startswith("<"), line
    i = s.index(">")
    subj, s = s[1:i], s[i + 1 :].lstrip()
    assert s.startswith("<"), line
    i = s.index(">")
    pred, s = s[1:i], s[i + 1 :].lstrip()
    assert s.startswith('"') and s.endswith('"') and len(s) >= 2, line
    body, out, i = s[1:-1], [], 0
    while i < len(body):
        c = body[i]
        if c == "\\":
            assert i + 1 < len(body), f"dangling escape: {line!r}"
            nxt = body[i + 1]
            out.append({'"': '"', "\\": "\\"}.get(nxt, "\\" + nxt))
            i += 2
        else:
            assert c != '"', f"unescaped quote inside literal: {line!r}"
            out.append(c)
            i += 1
    return subj, pred, "".join(out)


NT_ADVERSARIAL = [
    "plain", 'a"b', "a\\b", 'a\\"b', '\\"', '"\\', "a\\\\b", "",
    "x\\nx", "\\", '"""', "\\\\\\", 'ends with backslash\\',
    # the round-9 parser hardening: NEL/LS/PS are Java-regex line
    # terminators a non-DOTALL `.` silently drops
    "nel\x85nel", "ls\u2028ls", "ps\u2029ps",
]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_characters="\n\r",
                blacklist_categories=("Cs",),
            ),
            max_size=30,
        ),
        max_size=8,
    )
)
def test_ntriples_round_trip_agrees_with_grammar_model(spark, objs):
    """Three-way agreement on serializer output: the original values,
    the Spark parser's read-back, and the independent grammar-scan
    model must be identical -- on the fixed adversarial vectors plus
    hypothesis-found literals.  The existing round-trip property pins
    serialize-then-parse = id; this pins both halves against a third
    implementation, so a compensating bug pair (serializer emits a
    wrong escape the parser happens to undo) cannot stay green."""
    from rdfind_spark.sources.sinks import ntriples_lines
    from rdfind_spark.sources.triples import _parsed_quads

    raw = NT_ADVERSARIAL + objs
    df = spark.createDataFrame(
        [(f"s{i}", "p", o) for i, o in enumerate(raw)],
        "subj string, pred string, obj string",
    )
    lines = [r.value for r in ntriples_lines(df).collect()]
    modeled = {}
    for ln in lines:
        subj, pred, obj = _model_parse_nt_line(ln)
        assert pred == "p"
        modeled[subj] = obj
    assert modeled == {f"s{i}": o for i, o in enumerate(raw)}
    sparked = {
        r.subj: r.obj for r in _parsed_quads(ntriples_lines(df)).collect()
    }
    assert sparked == modeled


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=3, max_size=12
        ).map(" ".join),
        min_size=2,
        max_size=7,
    ),
    st.sampled_from([250_000, 500_000, 800_000, 1_000_000]),
)
def test_containment_prefix_cut_complete_on_random_corpora(
    spark, texts, threshold_ppm
):
    """Completeness of the probe-side prefix cut under hypothesis:
    on random tiny corpora over a 7-token vocabulary (dense overlap,
    many boundary scores) and across thresholds including the exact
    1.0 edge, the prefix-filtered Spark result must equal a
    brute-force Python model of the same hybrid measure (cold common
    count over full distinct-shingle size).  The integer prefix bound
    c - ceil(c*t) + 1 is the arithmetic under test — an off-by-one
    drops a qualifying pair."""
    from rdfind_spark.functions.dedup import (
        NGRAM_K,
        containment_pairs,
        _shingles,
    )

    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.src_id, r.dst_id): r.containment_ppm
        for r in containment_pairs(df, threshold_ppm=threshold_ppm).collect()
    }
    sh = _shingles(df, NGRAM_K).collect()
    sets: dict = {}
    for r in sh:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    want = {}
    for s, ss in sets.items():
        for d, ds in sets.items():
            if s == d:
                continue
            ppm = len(ss & ds) * 1_000_000 // len(ss)
            if ppm >= threshold_ppm:
                want[(s, d)] = ppm
    assert got == want

from rdfind_spark.sources.triples import (  # noqa: F401
    TABLES,
    TRIPLE_SPEC,
    load_table,
    load_tables,
    parse_prefixes,
    read_ntriples,
    triple_view,
    triple_view_sql,
)

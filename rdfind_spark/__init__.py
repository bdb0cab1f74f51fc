"""rdfind_spark — a PySpark-native engine with the capabilities of
stratosphere/rdfind (RDF conditional inclusion dependency discovery),
rebuilt Spark-first (DataFrame/SQL relational core, Catalyst-optimized),
plus large-scale training-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing).

Reference semantics: /root/reference (HPI RDFind, SIGMOD 2016).
This is NOT a port — see SURVEY.md for the structural analysis and the
relational reformulation (SURVEY.md §3.3) this package implements.
"""

__version__ = "0.1.0"

"""southpaw_spark — a PySpark-native incremental denormalization engine.

A from-scratch reimplementation of the capabilities of jwplayer/southpaw
(reference surveyed in SURVEY.md): CDC ingestion with upsert/tombstone
semantics, pluggable record filtering, N-way hierarchical left-outer
equi-joins producing nested documents per root primary key, tombstone
emission for deleted roots, and an incremental (dirty-root) maintenance
loop — all expressed Spark-first with the DataFrame API so Catalyst picks
physical strategies.

Beyond the reference, the package adds large-scale training-data pipeline
operators: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search over embedding columns, text analysis, and multimodal
column plumbing.
"""

from southpaw_spark.pipelines import annotate_docs, build_corpus, corpus_stream
from southpaw_spark.relations import Relation, load_relations, validate_relation
from southpaw_spark.session import get_spark

__all__ = [
    "Relation",
    "annotate_docs",
    "build_corpus",
    "corpus_stream",
    "get_spark",
    "load_relations",
    "validate_relation",
]

__version__ = "0.1.0"

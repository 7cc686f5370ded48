"""PySpark-native analytics engine re-expressing the semantics of
lahda/E-commerce-data-Engineering (see SURVEY.md) as idiomatic Spark.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC)
    schemas     explicit StructTypes for the order data model (SURVEY §1.4)
    sources     readers/writers + seeded generator + static catalog
    functions   scalar/aggregate Column expressions (SURVEY §2.8, §2.4)
    operators   joins, dedup, similarity, multimodal, text ops (§2.3, §2.11)
    plans       the analytics query library feeding __spark_entry__.queries()
    streaming   Structured Streaming variants of the pipeline (§2.9)
"""

__version__ = "0.1.0"

"""cyber_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference project ``karinakanjaria/cyber-etl`` (a
pandas + Neo4j cybersecurity ETL pipeline; see SURVEY.md).  Everything is
declared through the DataFrame / Spark SQL API so Catalyst + Tungsten pick
the physical strategy; Python only runs inside Arrow-batched pandas UDFs
where the built-in operators genuinely cannot express the semantics.

Layout
------
- ``session``    SparkSession factory (AQE, Arrow, UTC, sane shuffle sizing)
- ``sources``    table catalog + readers/writers (parquet/csv/json/stix)
- ``functions``  column-expression libraries (strings, text analytics, vectors)
- ``operators``  relational + similarity + dedup operator library
- ``graph``      property-graph layer: builders + DataFrame-iterative algorithms
- ``plans``      the named query registry (each query ships a DuckDB oracle)
- ``streaming``  Structured Streaming jobs over the events stream
- ``pipeline``   domain ETL parity (NVD CVE JSON, CISA alerts, MITRE STIX, GitHub)
"""

__version__ = "0.1.0"

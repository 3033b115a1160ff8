"""tika_wrap_spark — a from-scratch, PySpark-native content-extraction engine.

Re-expresses the capabilities of the reference (dingjingmaster/tika-wrap,
a C++/Qt wrapper that shells a file out to Apache Tika and collects ordered
plain text + a flat string/string metadata map) as a distributed Spark
pipeline over an interleaved-document corpus table
``(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)``.

Architecture (see SURVEY.md):
  - ``core/``      pure-Python extraction core (no Spark imports): magic-byte
                   sniffing, HTML boilerplate stripping (Arc90-style
                   text-density / link-density), synthetic-PDF content-stream
                   parsing with x/y layout reordering, metadata maps.
                   The SAME code generates golden fixtures and runs inside the
                   Spark UDFs, so span equality is byte-identical by
                   construction.
  - ``operators/`` Spark-side operators: Arrow-batched mapInPandas extraction,
                   skew salting, lineage/checkpoint/resume, dedup family
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                   similarity search, declarative text analysis, multimodal
                   stubs.
  - ``corpus.py``  deterministic seeded corpus generator (FIXTURES.md §1).
  - ``pipeline.py`` end-to-end extraction pipeline + lineage.
"""

__version__ = "0.1.0"

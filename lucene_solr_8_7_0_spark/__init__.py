"""PySpark-native inverted-index + BM25 search engine.

A from-scratch re-expression of the index-build and search core of
Apache Lucene 8.7 (reference study fork: HuBlanker/lucene-solr-8.7.0)
on idiomatic PySpark: DataFrame/SQL planning, Arrow-vectorized pandas
UDF kernels, parquet/Iceberg-style segmented table storage.

Layout
------
functions/  pure-numpy kernels: tokenizer, SmallFloat norms, FOR/PFOR
            postings codec, competitive impacts, float32 BM25, WAND.
operators/  distributed operators: doc numbering, inversion, segment
            encode, merge, stats, search, dedup/ANN/text-analytics.
sources/    corpus IO, synthetic fixture generator, table catalog.
plans/      query IR (Term/Boolean/Phrase/...), Lucene-equivalent
            rewrite rules, physical planning.
streaming/  incremental (near-real-time) index maintenance via
            Structured Streaming.
"""

__version__ = "0.1.0"

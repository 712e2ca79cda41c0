"""tlgs_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch rebuild of the query/data-processing capabilities of
marty1885/tlgs (C++ Gemini crawler + PostgreSQL tsvector/GIN full-text
search + SALSA/HITS link ranking), re-expressed as idiomatic Spark:

- corpus: Iceberg-shaped table of conversation/agent transcripts
  ``(conv_id string, turn_idx int, role string, text string,
  tool string, ts timestamp)``
- index: explicit document-sharded postings table (delta-gap + varint),
  doc_lengths, exact collection stats — the GIN-index analog
  (reference: tlgs/tlgs_ctl/main.cpp:31,41)
- query: BM25 top-k with block-max WAND pruning + the tlgs filter
  grammar (reference: tlgs/server/controllers/search.cpp:143-244)
- graph: SALSA/HITS as iterative DataFrame jobs
  (reference: search.cpp:253-412)
- ops: training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing)

Everything is DataFrame/SQL-first; Python appears only inside
Arrow-vectorized pandas UDFs (tokenizer, varint codec, WAND scorer).
"""

__version__ = "0.1.0"

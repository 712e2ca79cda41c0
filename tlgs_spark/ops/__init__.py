"""Operator library: training-data pipeline ops (dedup, similarity
search, text analysis, multimodal plumbing) plus the reference's
crawl-side operators (URL toolkit, gemtext/feed parsing, robots.txt
rules, URL blacklist, document extraction). All DataFrame-native (JVM
expressions) except where a vectorized pandas UDF is genuinely
required (gemtext AST, charset decode)."""

"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal plumbing. All DataFrame-native (JVM expressions)
except where a vectorized pandas UDF is genuinely required."""

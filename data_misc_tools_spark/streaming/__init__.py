"""Structured Streaming wrappers: file/Kafka sources, windowed aggregation,
availableNow replay — the engine's replacement for the reference's manual
micro-batch + offset bookkeeping (reference: process/KafkaHelper.scala,
process/Configs.scala:51-65)."""

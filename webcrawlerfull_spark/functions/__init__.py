"""Spark-native (JVM-side, codegen-friendly) column functions."""

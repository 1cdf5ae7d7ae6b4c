"""dbsurveyor_spark — a PySpark-native database survey + analytics engine.

Re-expresses the capabilities of EvilBit-Labs/dbsurveyor (schema survey,
sampling, data-quality analysis, documentation export) as distributed Spark
DataFrame computations, plus the LLM-data-pipeline operator set (dedup,
similarity search, text analysis, multimodal plumbing) needed at 100 TB scale.

Everything here is built on the public Apache Spark DataFrame/SQL API.
"""

__version__ = "0.1.0"

"""PySpark-native analytics engine with the capabilities of the reference
real-time engagement pipeline (ELMEHDIEttaki/RealTimeDataPipeline-8-Project).

Blueprint: /root/repo/SURVEY.md. The engine re-expresses the reference's
streaming ETL/enrichment dataflow and implied serving query surface as
idiomatic DataFrame/SQL/Structured Streaming operators, and extends it with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"

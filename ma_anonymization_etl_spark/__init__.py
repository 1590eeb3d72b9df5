"""PySpark-native analytics/anonymization-ETL engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference `jaSunny/MA-Anonymization-ETL` project
(an anonymization ETL pipeline; see /root/repo/SURVEY.md — the
reference checkout is empty, so SURVEY.md §2 is the capability
contract, built from the driver's characterization in BASELINE.json
and the public SDC literature).

Design principles (SURVEY.md §4):
- Declarative DataFrame plans; Catalyst/Tungsten pick physical strategy.
- Native Column expressions on every hot path (no row-at-a-time UDFs).
- Broadcast small dimensions, AQE on, deterministic seeds everywhere.
"""

__version__ = "0.1.0"

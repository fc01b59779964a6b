"""watermark_remove_spark — a from-scratch PySpark-native streaming
analytics engine with the (declared) capabilities of
``jack-wz/watermark-remove``, grafted onto web-scale text per
``BASELINE.json``.

Layout:
- ``spec.py``      normative extraction contract (pure stdlib)
- ``hashing.py``   Python xxHash64 == Spark ``F.xxhash64`` (parity-tested)
- ``fixtures.py``  deterministic synthetic pages corpus
- ``oracle.py``    pure-pandas golden oracle
- ``functions/``   Catalyst expression builders (JVM-side, codegen'd)
- ``operators/``   extract / windows / dedup / joins / skew / similarity
- ``sources/``     batch + streaming sources, catalog seam
- ``streaming/``   exactly-once sink, lineage, end-to-end pipeline
"""

__version__ = "0.1.0"

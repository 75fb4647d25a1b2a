"""spark-submit / console entry points.

Each module exposes ``main(argv) -> int`` and is wired to a console script in
pyproject.toml (``tstore-rollup``, ``tstore-corpus``, ``tstore-maintenance``),
mirroring the reference's installable-library posture
(/root/reference/pyproject.toml) on top of the cluster launch shape
``spark-submit --py-files dist/tstore_spark.zip -m tstore_spark.jobs.*``.
"""

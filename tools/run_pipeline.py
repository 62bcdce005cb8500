"""Thin spark-submit launcher: the package itself ships via --py-files.

Evidence-of-provenance: prints where ``folkscope_spark`` resolved from so a
``--py-files folkscope_spark.zip`` run (launched from a cwd that does NOT
contain the package) demonstrably imports the shipped zip on the driver —
and, because spark-submit forwards the zip on the executor PYTHONPATH, the
``mapInPandas`` kernel stages prove the executor side by running at all.
"""
import folkscope_spark
from folkscope_spark.pipeline import main

if __name__ == "__main__":
    print("folkscope_spark resolved from:", folkscope_spark.__file__)
    main()

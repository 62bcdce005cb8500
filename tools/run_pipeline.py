"""Thin spark-submit launcher: the package itself ships via --py-files."""
from folkscope_spark.pipeline import main

if __name__ == "__main__":
    main()

"""spark-submit application file for the pysearch CLI.

Usage (north_star submit shape):
    zip -r pysearch.zip pysearch
    spark-submit --py-files pysearch.zip cli_entry.py build --corpus ... --out ...

spark-submit executes an application file (it has no -m flag); this stub
is that file and delegates to pysearch.cli.main().
"""

from pysearch.cli import main

if __name__ == "__main__":
    main()

"""``python -m finmapreduce_spark`` — CLI batch entry (cli.py)."""

from finmapreduce_spark.cli import main

main()

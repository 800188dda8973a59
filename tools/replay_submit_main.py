"""spark-submit entrypoint: the driver script shipped NEXT TO (not inside)
the --py-files zip. All engine code is imported from the zip on the
executors' PYTHONPATH — this file only parses args and delegates."""

from etl_spark.cdc.runner import main

if __name__ == "__main__":
    main()

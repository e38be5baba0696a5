from greenmask_spark.validate.diff import diff_report, schema_diff  # noqa: F401

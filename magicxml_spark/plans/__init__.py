"""End-to-end conversion pipelines composed from sources/operators/sinks."""

from magicxml_spark.plans.convert import convert_file, xml_to_csv  # noqa: F401

from etl_geotab_spark.pipeline.geotab import geotab_pipeline

__all__ = ["geotab_pipeline"]

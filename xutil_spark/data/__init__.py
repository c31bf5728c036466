from xutil_spark.data.synth import images_table, tiles_table, ref_points_table

__all__ = ["images_table", "tiles_table", "ref_points_table"]

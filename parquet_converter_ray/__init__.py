"""parquet_converter_ray — Ray-Data-native columnar encode engine."""
__version__ = "0.1.0"

from featureform_spark.sources.readers import read_location, read_file
from featureform_spark.sources.writers import write_versioned, latest_version_dir, write_file

__all__ = ["read_location", "read_file", "write_versioned", "latest_version_dir", "write_file"]

from change_data_capturer_ms_spark.lake.manifest import Manifest, FileEntry
from change_data_capturer_ms_spark.lake.table import LakeTable

__all__ = ["Manifest", "FileEntry", "LakeTable"]

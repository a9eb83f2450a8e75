from change_data_capturer_ms_spark.operators.dedupe import (
    lww_dedupe,
    lww_dedupe_window,
    salted_repartition,
)

__all__ = ["lww_dedupe", "lww_dedupe_window", "salted_repartition"]

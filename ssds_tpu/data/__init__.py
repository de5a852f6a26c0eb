from ssds_tpu.data.factory import detection_collate, load_data

__all__ = ["load_data", "detection_collate"]

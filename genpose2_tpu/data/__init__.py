from genpose2_tpu.data.synthetic import SyntheticPoseData

__all__ = ["SyntheticPoseData"]

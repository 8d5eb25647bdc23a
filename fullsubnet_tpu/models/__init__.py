from fullsubnet_tpu.models.fullband import FullBandModel
from fullsubnet_tpu.models.fullsubnet import FullSubNet
from fullsubnet_tpu.models.fast_fullsubnet import FastFullSubNet
from fullsubnet_tpu.models.improved_fullsubnet import ImprovedFullSubNet
from fullsubnet_tpu.models.subband_baseline import SubBandBaseline

MODEL_REGISTRY = {
    "fullband_baseline": FullBandModel,
    "fullsubnet": FullSubNet,
    "fast_fullsubnet": FastFullSubNet,
    "improved_fullsubnet": ImprovedFullSubNet,
    "subband_baseline": SubBandBaseline,
}

from fullsubnet_tpu.data.wavio import read_wav, write_wav, load_wav
from fullsubnet_tpu.data.datasets import (
    TrainDataset,
    ValidationDataset,
    InferenceDataset,
)
from fullsubnet_tpu.data.loader import DataLoader

from fullsubnet_tpu.infer.inferencer import Inferencer

from fullsubnet_tpu.acoustics.stft import (
    stft,
    istft,
    stft_complex,
    mag_phase,
    hann_window,
)
from fullsubnet_tpu.acoustics.mask import (
    build_complex_ideal_ratio_mask,
    compress_cIRM,
    decompress_cIRM,
    complex_mul,
)
from fullsubnet_tpu.acoustics.norm import (
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    hybrid_norm,
    norm_wrapper,
)
from fullsubnet_tpu.acoustics.feature import (
    norm_amplitude,
    tailor_dB_FS,
    is_clipped,
    subsample,
    aligned_subsample,
    overlap_cat,
    activity_detector,
    drop_band,
    batch_shuffle_frequency,
    freq_unfold,
)
from fullsubnet_tpu.acoustics.filterbank import (
    mel_filterbank,
    apply_filterbank,
    inverse_filterbank,
)

from mpd_tpu.data.normalization import (
    LimitsNormalizer,
    GaussianNormalizer,
    IdentityNormalizer,
    fit_limits_normalizer,
    fit_safe_limits_normalizer,
    fit_gaussian_normalizer,
    fit_normalizer,
)
from mpd_tpu.data.dataset import TrajectoryDataset

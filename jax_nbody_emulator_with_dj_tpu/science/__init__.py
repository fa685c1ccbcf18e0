"""JAX-native validation / science toolkit.

Replaces the external native tooling the reference's scripts lean on
(SURVEY.md section 2.2): Pylians power spectra -> ``powerspec``, CLASS linear
P(k) -> ``linear_pk`` (Eisenstein-Hu 1998), DISCO-DJ 1LPT -> ``lpt``,
MAS deposition -> ``mas``, field resizing -> ``resize``, Minkowski
functionals -> ``minkowski``, bispectrum -> ``bispectrum``.
Everything is jittable and runs on device.
"""

from .powerspec import power_spectrum, cross_power, transfer_and_correlation, summary_metrics
from .powerspec_sharded import (
    power_spectrum_sharded,
    cross_power_sharded,
    transfer_and_correlation_sharded,
    summary_metrics_sharded,
)
from .field_sharded import (
    gaussian_random_field_sharded,
    zeldovich_displacement_sharded,
    deposit_displacement_sharded,
    displacement_to_density_sharded,
    deconvolve_mas_sharded,
)
from .resize_sharded import (
    upsample_modes_sharded,
    upsample_fourier_sharded,
    downsample_average_sharded,
    gaussian_smooth_sharded,
)
from .stats_sharded import (
    minkowski_functionals_sharded,
    reduced_bispectrum_sharded,
)
from .linear_pk import eisenstein_hu_pk, sigma_r, normalize_sigma8
from .grf import gaussian_random_field, white_noise_field
from .lpt import zeldovich_displacement, displacement_to_density
from .mas import deposit, deconvolve_mas
from .minkowski import minkowski_functionals
from .bispectrum import reduced_bispectrum
from .resize import (
    upsample_modes,
    upsample_fourier,
    upsample_linear,
    downsample_average,
    gaussian_smooth,
    resize_density_grid,
)
from .halofit import halofit_pk
from .halos import (
    friends_of_friends,
    friends_of_friends_slabbed,
    positions_from_displacement,
    empirical_hmf,
    tinker08_hmf,
    particle_mass_msun_h,
)

__all__ = [
    "power_spectrum",
    "cross_power",
    "transfer_and_correlation",
    "summary_metrics",
    "power_spectrum_sharded",
    "cross_power_sharded",
    "transfer_and_correlation_sharded",
    "summary_metrics_sharded",
    "gaussian_random_field_sharded",
    "zeldovich_displacement_sharded",
    "deposit_displacement_sharded",
    "displacement_to_density_sharded",
    "deconvolve_mas_sharded",
    "minkowski_functionals_sharded",
    "reduced_bispectrum_sharded",
    "upsample_modes_sharded",
    "upsample_fourier_sharded",
    "downsample_average_sharded",
    "gaussian_smooth_sharded",
    "eisenstein_hu_pk",
    "sigma_r",
    "normalize_sigma8",
    "gaussian_random_field",
    "white_noise_field",
    "zeldovich_displacement",
    "displacement_to_density",
    "deposit",
    "deconvolve_mas",
    "minkowski_functionals",
    "reduced_bispectrum",
    "upsample_modes",
    "upsample_fourier",
    "upsample_linear",
    "downsample_average",
    "gaussian_smooth",
    "resize_density_grid",
    "halofit_pk",
    "friends_of_friends",
    "friends_of_friends_slabbed",
    "positions_from_displacement",
    "empirical_hmf",
    "tinker08_hmf",
    "particle_mass_msun_h",
]

from .discretization import (  # noqa: F401
    EDMDiscretization,
    LegacyDDPMDiscretization,
    Img2ImgDiscretizationWrapper,
    make_discretization,
)
from .scaling import EDMScaling, EpsScaling, VScaling, make_scaling  # noqa: F401
from .weighting import (  # noqa: F401
    EDMWeighting,
    EpsWeighting,
    UnitWeighting,
    VWeighting,
    make_weighting,
)
from .sigma_sampling import DiscreteSampling, EDMSampling, make_sigma_sampler  # noqa: F401
from .denoiser import Denoiser, DiscreteDenoiser, make_denoiser  # noqa: F401
from .guidance import IdentityGuider, VanillaCFG, make_guider  # noqa: F401
from .samplers import (  # noqa: F401
    DPMPP2MSampler,
    DPMPP2SAncestralSampler,
    EulerAncestralSampler,
    EulerEDMSampler,
    HeunEDMSampler,
    LinearMultistepSampler,
    make_sampler,
)
from .loss import StandardDiffusionLoss  # noqa: F401

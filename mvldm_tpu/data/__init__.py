from .types import Example, Stage, ViewIndex, Views
from .view_samplers import (
    ViewSampler,
    ViewSamplerAllCfg,
    ViewSamplerArbitraryCfg,
    ViewSamplerBoundedCfg,
    ViewSamplerEvaluationCfg,
    ViewSamplerRandomCfg,
    get_view_sampler,
)

__all__ = [
    "Example",
    "Stage",
    "ViewIndex",
    "Views",
    "ViewSampler",
    "ViewSamplerAllCfg",
    "ViewSamplerArbitraryCfg",
    "ViewSamplerBoundedCfg",
    "ViewSamplerEvaluationCfg",
    "ViewSamplerRandomCfg",
    "get_view_sampler",
]

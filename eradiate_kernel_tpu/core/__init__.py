from . import bbox, distr, frame, math, ray, rng, spectrum, transform, types, warp  # noqa: F401
from .frame import Frame  # noqa: F401
from .ray import Ray, spawn_ray  # noqa: F401
from .rng import Sampler  # noqa: F401
from .transform import Transform  # noqa: F401
from .types import Variant, pytree_dataclass  # noqa: F401

from .scene import Scene, SceneConfig  # noqa: F401
from .build import load_dict  # noqa: F401

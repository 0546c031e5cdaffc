from .scene import Scene, SceneConfig  # noqa: F401
from .build import load_dict  # noqa: F401
from . import xml  # noqa: F401
from .xml import load_file, load_string  # noqa: F401

from .transform import Transform
from .layer import Layer, Canvas
from . import color

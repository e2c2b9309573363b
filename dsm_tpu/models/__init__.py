from . import mimi, lm

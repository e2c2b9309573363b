from . import mimi

from . import asr

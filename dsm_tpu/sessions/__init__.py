from . import asr, lm_gen, tts

from . import conv, norm, mlp, attention, transformer, rvq, sampling

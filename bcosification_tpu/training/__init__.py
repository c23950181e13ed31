from bcosification_tpu.training import agc, ema, steps

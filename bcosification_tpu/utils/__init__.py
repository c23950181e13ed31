from bcosification_tpu.utils.profiling import StepTimer, trace

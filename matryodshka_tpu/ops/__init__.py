from matryodshka_tpu.ops.resample import (bilinear_wrap_resample,  # noqa: F401
                                          bilinear_zero_resample,
                                          resample_stack)

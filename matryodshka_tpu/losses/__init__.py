from matryodshka_tpu.losses.basic import (l2_loss,  # noqa: F401
                                          spherical_weights)

from matryodshka_tpu.losses.elpips import api  # noqa: F401

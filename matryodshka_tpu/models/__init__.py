from matryodshka_tpu.models.unet import MSIUNet  # noqa: F401
from matryodshka_tpu.models import msi  # noqa: F401

from idealnerf_tpu.utils.logging import get_logger
from idealnerf_tpu.utils.metrics import img2mse, mse2psnr, to8b

from .configs import GemmConfig, get_gemm_config

from hdpgpc_tpu.ops import hmm, kalman, kernels, linalg, stick_breaking

__all__ = ["hmm", "kalman", "kernels", "linalg", "stick_breaking"]

from hdpgpc_tpu.warp.monotone import (WarpPrior, WarpResult, build_batch_warp,
                                      warp_prior_score)

__all__ = ["WarpPrior", "WarpResult", "build_batch_warp",
           "warp_prior_score"]

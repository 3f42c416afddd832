from hdpgpc_tpu.parallel.records import (make_mesh, sharded_vi_step,
                                         shard_records)

__all__ = ["make_mesh", "sharded_vi_step", "shard_records"]

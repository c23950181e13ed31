from bcosification_tpu.parallel import fsdp, mesh, pp, sp, tp
from bcosification_tpu.parallel.mesh import make_mesh, replicate, shard_batch

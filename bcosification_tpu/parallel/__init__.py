from bcosification_tpu.parallel import mesh
from bcosification_tpu.parallel.mesh import make_mesh, replicate, shard_batch

from tensorflowasr_tpu.parallel.sharding import batch_sharding, make_data_parallel_mesh, replicate, shard_batch

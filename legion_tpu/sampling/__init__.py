from legion_tpu.sampling.sampler import NeighborSampler, SampleBatch

__all__ = ["NeighborSampler", "SampleBatch"]

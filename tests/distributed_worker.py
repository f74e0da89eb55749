"""Worker process for the multi-host smoke test (run via subprocess).

Usage: python distributed_worker.py <coordinator> <num_procs> <proc_id>
       <workdir>
Each process runs its share of a chunked doubling job against a shared
TensorStore output volume, then process 0 validates the assembled result.
"""

import sys


def main():
  coordinator, num_procs, proc_id, workdir = sys.argv[1:5]
  num_procs, proc_id = int(num_procs), int(proc_id)

  import jax
  jax.config.update('jax_platforms', 'cpu')
  import numpy as np

  sys.path.insert(0, __file__.rsplit('/', 2)[0])
  from sofima_tpu.parallel import distributed
  from sofima_tpu.processor import runner
  from sofima_tpu.utils.volume import InMemoryVolume, TensorStoreVolume

  distributed.initialize(coordinator_address=coordinator,
                         num_processes=num_procs, process_id=proc_id)
  assert distributed.process_count() == num_procs

  rng = np.random.RandomState(0)  # same data on every process
  data = rng.rand(1, 2, 40, 40).astype(np.float32)
  vol = InMemoryVolume(data, fill_value=0.0)

  class Doubler(runner.SubvolumeProcessor):

    def process(self, subvol):
      return runner.Subvolume(subvol.data * 2, subvol.bbox)

  out_path = f'{workdir}/out'
  if proc_id == 0:
    TensorStoreVolume.create(out_path, (1, 2, 40, 40), np.float32,
                             chunk_size=(1, 1, 16, 16))
  distributed.barrier('created')
  out_vol = TensorStoreVolume.open(out_path)

  distributed.process_volume_distributed(
      Doubler(), vol, output_volume=out_vol, subvolume_size=(16, 16, 2))

  if proc_id == 0:
    result = out_vol[(slice(None),) * 4]
    np.testing.assert_allclose(result, data * 2, atol=1e-6)
    print('DISTRIBUTED_OK', flush=True)


if __name__ == '__main__':
  main()

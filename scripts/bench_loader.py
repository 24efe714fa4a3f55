"""Data-pipeline throughput: native decode vs python decode vs packed loader."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os, time, tempfile
import numpy as np

def main():
    from cips_tpu.data import nifti
    from cips_tpu.data.dataset import (BatchLoader, PackedDataset, PairedVolumeDataset,
                                       pack_pairs, pad_crop_np, max_normalize_np)
    from cips_tpu.data.manifest import PairRow, write_manifest
    from cips_tpu.runtime import native

    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    shape = (120, 150, 120)
    n = 12
    rows = []
    for i in range(n):
        subj = f"s{i}"
        rows.append(PairRow(subj, "2012-01-01", "2012-01-15"))
        for base, date in (("t1", "2012-01-01"), ("pet", "2012-01-15")):
            d = os.path.join(tmp, base, subj, date)
            os.makedirs(d)
            nifti.write(os.path.join(d, "img.nii.gz"), rng.random(shape).astype(np.float32))
    csv = os.path.join(tmp, "pairs.csv")
    write_manifest(csv, rows)
    raw_mb = np.prod(shape) * 4 / 1e6

    ds = PairedVolumeDataset(csv, pet_dir=os.path.join(tmp, "pet"), t1_dir=os.path.join(tmp, "t1"))
    # python decode
    p = ds.paths[0][0]
    t0 = time.perf_counter()
    for _ in range(6):
        max_normalize_np(pad_crop_np(nifti.read_array(p).astype(np.float32), (96,128,96)))
    py_t = (time.perf_counter()-t0)/6
    # native decode
    t0 = time.perf_counter()
    for _ in range(6):
        native.decode(p, (96,128,96))
    nat_t = (time.perf_counter()-t0)/6
    print(f"decode+preprocess per volume ({raw_mb:.0f}MB raw): python {py_t*1000:.1f}ms "
          f"({raw_mb/py_t/1000:.2f} GB/s) | native {nat_t*1000:.1f}ms ({raw_mb/nat_t/1000:.2f} GB/s) "
          f"-> {py_t/nat_t:.1f}x", flush=True)

    out = pack_pairs(ds, os.path.join(tmp, "packed"))
    packed = PackedDataset(out)
    loader = BatchLoader(packed, batch_size=4)
    t0 = time.perf_counter()
    nb = 0
    for _ in range(4):
        for b in loader.epoch(nb):
            nb += 1
    dt = time.perf_counter()-t0
    vols = nb * 4
    mb = vols * 2 * np.prod((96,128,96)) * 4 / 1e6  # fp32 batches produced
    print(f"packed loader: {vols/dt:.1f} volumes/s ({mb/dt/1000:.2f} GB/s materialised)", flush=True)

if __name__ == "__main__":
    main()

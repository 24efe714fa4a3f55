"""End-to-end TPU demo: synthetic ADNI-like tree -> pack -> train (full
(96,128,96) flagship, batch 8) -> predict -> folder metrics.
Writes a summary to stdout; artifacts under DEMO_DIR."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, os, shutil, time
import numpy as np

DEMO_DIR = os.environ.get("DEMO_DIR", "/root/demo_exp")

def make_data(root, n_subjects=24, shape=(120, 150, 120)):
    from cips_tpu.data import nifti
    from cips_tpu.data.manifest import PairRow, write_manifest
    rng = np.random.default_rng(0)
    rows = []
    import scipy.ndimage as ndi
    for i in range(n_subjects):
        subj = f"sub{i:03d}"
        t1_date, pet_date = "2012-01-01", "2012-01-15"
        t1 = ndi.gaussian_filter(rng.random(shape).astype(np.float32), 4.0)
        t1 = np.clip((t1 - t1.mean()) / (t1.std() + 1e-6) * 0.25 + 0.5, 0, 1)
        # PET is a smooth function of T1 anatomy + subject-specific offset
        pet = np.clip(0.7 * t1 + 0.1 + 0.05 * ndi.gaussian_filter(rng.random(shape).astype(np.float32), 6.0), 0, 1)
        for base, date, vol in (("t1", t1_date, t1), ("pet", pet_date, pet)):
            d = os.path.join(root, base, subj, date)
            os.makedirs(d, exist_ok=True)
            nifti.write(os.path.join(d, "img.nii.gz"), vol)
        rows.append(PairRow(subj, t1_date, pet_date,
                            {"ABETA": str(400 + 20 * i), "Age": str(70 + i % 10),
                             "Sex": str(i % 2), "APOE4": str(i % 3), "PTEDUCAT": "16"}))
    write_manifest(os.path.join(root, "train.csv"), rows[:20])
    write_manifest(os.path.join(root, "test.csv"), rows[20:])
    stats = {"ABETA": [0, 2000], "Age": [55, 94], "PTEDUCAT": [6, 20]}
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump(stats, f)

def main():
    if os.path.exists(DEMO_DIR):
        shutil.rmtree(DEMO_DIR)
    os.makedirs(DEMO_DIR)
    make_data(DEMO_DIR)
    from cips_tpu.cli import metrics as metrics_cli
    from cips_tpu.cli import output_predict, train_unet

    common = [
        "--training_info_csv", f"{DEMO_DIR}/train.csv",
        "--eval_info_csv", f"{DEMO_DIR}/test.csv",
        "--PET_dir", f"{DEMO_DIR}/pet", "--T1_dir", f"{DEMO_DIR}/t1",
        "--min_and_max", f"{DEMO_DIR}/stats.json",
        "--exp_dir", f"{DEMO_DIR}/exp", "--use_condition",
        "--batch_size", "8",
    ]
    t0 = time.time()
    train_unet.main(common + ["--epochs", "20", "--save_every", "5", "--eval_every", "5"])
    print(f"TRAIN_WALL {time.time()-t0:.0f}s", flush=True)
    results = output_predict.main(common + ["--output_dir", f"{DEMO_DIR}/pred"])
    print("PREDICT", results.summary(), flush=True)
    out = metrics_cli.main(["--root", f"{DEMO_DIR}/pred", "--metric_shape", "96", "128", "96"])
    print("FOLDER_METRICS", out, flush=True)

if __name__ == "__main__":
    main()

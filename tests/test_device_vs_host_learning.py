"""Device-vs-host sampling estimators LEARN equivalently (VERDICT r3 item 2).

The two pipelines are separate-but-equivalent estimators (different RNG
streams and packing order — device_sampler.py docstring); this gate trains
the same model through BOTH at an identical step budget and seed on a
latent-structure synthetic and requires (a) both clear an above-chance AUC
bar and (b) their final AUCs agree within a tolerance. If the device
sampler's class-packed layout, truncation order, or edge-only-hop
calibration biased sampling in a way that hurts learning, (a)/(b) catch it.
The flagship-scale paired curves live in docs/CONFIG4_LEARNING_r4.txt
(scripts/validate_config4_learning.py, run on the TPU).
"""

import numpy as np

from bignn_tpu.data import make_synthetic_ddi
from bignn_tpu.models import BiGNN, BiGNNConfig
from bignn_tpu.train import MinibatchTrainer, TrainConfig


def test_device_vs_host_learning():
    ds = make_synthetic_ddi(num_drugs=150, feat_dim=16, avg_degree=10.0,
                            min_atoms=4, max_atoms=12, latent_dim=4, seed=7)
    model = BiGNN(BiGNNConfig.full_bignn(feat_dim=16, dim=32, heads=2))
    auc = {}
    for mode in (True, False):
        tr = MinibatchTrainer(
            model, ds,
            TrainConfig(lr=3e-3, epochs=10, batch_size=48, seed=0,
                        eval_every=10),
            fanouts=(6,), calibrate_caps=4, device_sample=mode,
            dispatch_chunk=4)
        _, result = tr.fit(steps_per_epoch=16)
        auc[mode] = result["test_auc"]
    # measured on CPU CI: device 0.635 / host 0.621 (chance 0.5)
    assert auc[True] >= 0.58, auc
    assert auc[False] >= 0.58, auc
    assert abs(auc[True] - auc[False]) <= 0.06, auc

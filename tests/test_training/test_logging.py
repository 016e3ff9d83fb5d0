"""MetricsLogger cadence under K-step dispatch."""
import json

from mm_training_tpu.utils.logging import MetricsLogger


def test_log_step_interval_crossing(tmp_path):
    """With K-step dispatch the step counter advances by K per call; a
    modulo gate (step % log_every == 0) would log every 400 steps at K=16
    (or never for K that 50 never divides) — the gate must fire on every
    log_every-interval crossing."""
    lg = MetricsLogger(str(tmp_path), 'x', log_every=50)
    for step in range(16, 16 * 20 + 1, 16):
        lg.log_step(step, {'train_loss': 1.0})
    steps = [json.loads(l)['step']
             for l in open(tmp_path / 'metrics.jsonl')]
    # one emission per 50-step interval crossed: 64, 112, 160, 208, 256, 304
    assert steps == [64, 112, 160, 208, 256, 304]

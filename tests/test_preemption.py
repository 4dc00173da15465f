"""Preemption-safe training (VERDICT round-2 item 7): SIGTERM mid-run must
flush a checkpoint at the exact iteration and exit cleanly; a relaunch with
the same work_dir resumes losslessly from that iteration.

Runs the real CLI in a subprocess (the signal path only installs on the
main thread) on the CPU toy stack.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _launch(work_dir, total_iters):
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    return subprocess.Popen(
        [sys.executable, 'train.py', 'configs/toy/checkerboard_flow.py',
         '--platform', 'cpu',
         '--work-dir', work_dir, '--cfg-options',
         f'total_iters={total_iters}', 'checkpoint_config.interval=1000000',
         'log_config.interval=100',
         'model.diffusion.denoising.hidden=(64,64)',
         'data.train_dataloader.samples_per_gpu=64'],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


def _latest_step(work_dir):
    root = os.path.join(work_dir, 'checkpoints', 'checkerboard_flow')
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if d.isdigit()]
    return max(steps) if steps else None


@pytest.mark.slow
def test_sigterm_flushes_checkpoint_and_resumes(tmp_path):
    work_dir = str(tmp_path / 'wd')
    proc = _launch(work_dir, total_iters=1000000)
    try:
        # wait for compile + some real iterations (log lines appear), then
        # preempt
        deadline = time.time() + 300
        saw_iter = False
        lines = []
        while time.time() < deadline:
            line = proc.stdout.readline()
            if not line:
                break
            lines.append(line)
            if 'iter [' in line.lower() or 'iter 100' in line:
                saw_iter = True
                break
        assert saw_iter, 'no training progress before deadline:\n' + \
            ''.join(lines[-30:])
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        lines.append(out)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, ''.join(lines[-30:])
    full = ''.join(lines)
    assert 'preempted at iter' in full, full[-2000:]

    step = _latest_step(work_dir)
    assert step is not None and step > 0, f'no flushed checkpoint ({step})'
    # preemption save is NOT interval-aligned (interval was 1000000)
    assert step != 1000000

    # relaunch: must resume at the flushed iter and run to completion
    proc2 = _launch(work_dir, total_iters=step + 30)
    out2, _ = proc2.communicate(timeout=600)
    assert proc2.returncode == 0, out2[-2000:]
    assert f'resumed from iter {step}' in out2, out2[-2000:]
    assert _latest_step(work_dir) == step + 30

"""Multi-process (multi-host analogue) TP serving test.

Spawns TWO OS processes, each owning half the devices of one mesh, and runs
the quantized TP forward across the process boundary — proving the psum /
all_gather collectives legalize and produce single-device-exact logits when
the `model` axis crosses processes. This validates the multi-host scaffold
(parallel/distributed.py) the way the reference would need MPI + multi-GPU
hardware to do (nccl_utils.cc:308-411).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_tp_forward():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "_distributed_child.py")
    env = dict(os.environ)
    # one local CPU device per process => the tp=2 axis SPANS processes
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)  # child sets the platform via jax.config
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"DISTRIBUTED_OK process={i}" in out, out


def test_process_mesh_single_process_shape():
    """process_mesh on one process == the plain (data, model) mesh."""
    import jax

    from flexq_tpu.parallel.distributed import process_mesh

    mesh = process_mesh(tp=4, dp=2)
    assert mesh.shape == {"data": 2, "model": 4}
    assert mesh.axis_names == ("data", "model")
    # tp preference: consecutive local devices along the model axis
    ids = [[d.id for d in row] for row in mesh.devices]
    assert ids[0] == [0, 1, 2, 3]


def test_two_process_replicated_serving():
    """Multi-host serving topology: leader + follower processes run the SAME
    continuous-batching scheduler over a tp=2 mesh that spans them, kept in
    lockstep by command-log replication (serve/replicated.py). The leader's
    outputs must equal a single-device scheduler run."""
    coord, cmd = _free_port(), _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "_replicated_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(coord), str(cmd)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
    assert "REPLICATED_OK leader" in outs[0], outs[0]
    assert "REPLICATED_OK follower" in outs[1], outs[1]


def test_two_process_sharded_weight_loading(tmp_path):
    """Each process loads ONLY its TP rank's shard files (exporter --tp 2 +
    load_packed_sharded) and the spanning-mesh TP forward matches the
    single-device forward — the 70B multi-host weight-loading pattern."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp  # noqa: F401
    from transformers import LlamaConfig, LlamaForCausalLM

    from flexq_tpu.export import export_checkpoint

    torch.manual_seed(5)
    cfg_hf = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg_hf).eval()
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)
    packed = tmp_path / "tp2"
    export_checkpoint(str(hf_dir), str(packed), head_bits=6, tp=2)

    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "_sharded_load_child.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(port), str(packed)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=root, env=env,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"SHARDED_LOAD_OK process={i}" in out, out

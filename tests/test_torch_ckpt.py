"""Reference torch-checkpoint interop (train/checkpoint.py:load_torch).

Builds synthetic `chkpnt*.pth` files with the exact tuple layout of the
reference's capture() (reference scene/gaussian_model.py:84-100) — both the
14-tuple and the legacy 12-tuple the reference upgrades in place
(train.py:168-184) — and asserts they load into GaussianState/AdamState/
DensifyStats with the right values in the right fields.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from opengaussian_tpu.train.checkpoint import load_torch  # noqa: E402


def _make_capture(n, rng, with_ins_feat=True, with_opt_state=True):
    xyz = torch.tensor(rng.normal(0, 1, (n, 3)).astype(np.float32))
    f_dc = torch.tensor(rng.normal(0, 1, (n, 1, 3)).astype(np.float32))
    f_rest = torch.tensor(rng.normal(0, 0.1, (n, 15, 3)).astype(np.float32))
    scaling = torch.tensor(rng.normal(-3, 1, (n, 3)).astype(np.float32))
    rotation = torch.tensor(rng.normal(0, 1, (n, 4)).astype(np.float32))
    opacity = torch.tensor(rng.normal(0, 1, (n, 1)).astype(np.float32))
    max_radii = torch.tensor(rng.uniform(0, 50, (n,)).astype(np.float32))
    grad_accum = torch.tensor(rng.uniform(0, 1, (n, 1)).astype(np.float32))
    denom = torch.tensor(rng.uniform(0, 9, (n, 1)).astype(np.float32))

    params = [xyz, f_dc, f_rest, opacity, scaling, rotation]
    names = ["xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation"]
    if with_ins_feat:
        ins_feat = torch.tensor(rng.uniform(0, 1, (n, 6)).astype(np.float32))
        params.append(ins_feat)
        names.append("ins_feat")
    for p in params:
        p.requires_grad_(True)

    opt = torch.optim.Adam(
        [{"params": [p], "lr": 0.001, "name": nm} for p, nm in zip(params, names)],
        lr=0.0, eps=1e-15,
    )
    if with_opt_state:
        # one real step so exp_avg/exp_avg_sq are nonzero
        loss = sum((p**2).mean() for p in params)
        loss.backward()
        opt.step()

    if with_ins_feat:
        tup = (3, xyz, f_dc, f_rest, scaling, rotation, opacity,
               ins_feat, torch.empty(0), max_radii, grad_accum, denom,
               opt.state_dict(), 4.5)
    else:
        tup = (3, xyz, f_dc, f_rest, scaling, rotation, opacity,
               max_radii, grad_accum, denom, opt.state_dict(), 4.5)
    return tup, dict(
        xyz=xyz, f_dc=f_dc, f_rest=f_rest, scaling=scaling,
        rotation=rotation, opacity=opacity,
        ins_feat=ins_feat if with_ins_feat else None,
        max_radii=max_radii, grad_accum=grad_accum, denom=denom, opt=opt,
    )


def test_load_14_tuple(tmp_path):
    rng = np.random.default_rng(0)
    n = 100
    tup, ref = _make_capture(n, rng)
    path = str(tmp_path / "chkpnt30000.pth")
    torch.save((tup, 30000), path)

    state, adam, stats, it, lr_scale = load_torch(path)
    assert it == 30000
    assert lr_scale == 4.5
    assert int(np.asarray(state.num_alive)) == n
    np.testing.assert_allclose(
        np.asarray(state.means)[:n], ref["xyz"].detach().numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.sh_dc)[:n], ref["f_dc"].detach().numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.log_scales)[:n], ref["scaling"].detach().numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.logit_opacity)[:n],
        ref["opacity"].detach().numpy().reshape(-1), rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(state.ins_feat)[:n], ref["ins_feat"].detach().numpy(),
        rtol=1e-6,
    )
    # dead padding is actually dead
    assert not np.asarray(state.alive)[n:].any()
    assert np.asarray(state.opacity)[n:].max() == 0.0

    # Adam moments land on the right fields (group-name mapping)
    st = ref["opt"].state_dict()["state"]
    np.testing.assert_allclose(
        np.asarray(adam.mu["means"])[:n], st[0]["exp_avg"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(adam.nu["quats"])[:n], st[5]["exp_avg_sq"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(adam.mu["logit_opacity"])[:n],
        st[3]["exp_avg"].numpy().reshape(-1), rtol=1e-6,
    )
    assert int(np.asarray(adam.count)) == 1

    # densify stats
    np.testing.assert_allclose(
        np.asarray(stats.max_radii2d)[:n], ref["max_radii"].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats.grad_accum)[:n],
        ref["grad_accum"].numpy().reshape(-1), rtol=1e-6,
    )


def test_load_legacy_12_tuple(tmp_path):
    """Vanilla-3DGS checkpoint: fresh ins_feat injected, optimizer reset
    (reference train.py:168-184)."""
    rng = np.random.default_rng(1)
    n = 64
    tup, ref = _make_capture(n, rng, with_ins_feat=False)
    path = str(tmp_path / "chkpnt7000.pth")
    torch.save((tup, 7000), path)

    state, adam, stats, it, lr_scale = load_torch(path)
    assert it == 7000
    f = np.asarray(state.ins_feat)[:n]
    assert f.shape == (n, 6)
    assert (f >= 0).all() and (f < 1).all() and f.std() > 0.1
    # optimizer was reset, like the reference's replacement with a fresh one
    assert int(np.asarray(adam.count)) == 0
    assert float(np.abs(np.asarray(adam.mu["means"])).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(state.means)[:n], ref["xyz"].detach().numpy(), rtol=1e-6
    )


def test_trainer_restores_torch_checkpoint(tmp_path):
    """Trainer.restore_checkpoint dispatches on .pth and picks up state."""
    from opengaussian_tpu.config import Config
    from opengaussian_tpu.data import dataset
    from tests.test_data import make_colmap_scene

    rng = np.random.default_rng(2)
    tup, _ = _make_capture(120, rng)
    path = str(tmp_path / "chkpnt100.pth")
    torch.save((tup, 100), path)

    root = str(tmp_path / "scene")
    make_colmap_scene(root, n_views=3)
    scene = dataset.load_scene(root)
    from opengaussian_tpu.train.loop import Trainer

    tr = Trainer(scene, Config(), str(tmp_path / "out"), autotune_budgets=False)
    tr.restore_checkpoint(path)
    assert tr.iteration == 100
    assert int(np.asarray(tr.state.num_alive)) == 120
    assert tr.spatial_lr_scale == 4.5
    assert tr.kms.cls_ids.shape[0] == tr.state.capacity

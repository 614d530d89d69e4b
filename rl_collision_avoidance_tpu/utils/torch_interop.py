"""Import/export reference PyTorch checkpoints (``policy/stage2.pth``-style).

The reference stores ``CNNPolicy.state_dict()`` (``ppo_stage1.py:124``).  This
converts such a state dict to/from our flax parameter pytree so users can
carry trained policies across frameworks.

Layout notes:
  * torch Conv1d weight (out, in, k)  <->  flax Conv kernel (k, in, out);
  * torch Linear weight (out, in)     <->  flax Dense kernel (in, out);
  * the post-conv flatten differs: torch flattens (C=32, L=128)
    channel-major (``model/net.py:44``), flax flattens (L, C) length-major —
    the first fully connected layer's input axis must be permuted.
"""
from __future__ import annotations

import numpy as np

_L, _C = 128, 32  # conv output length x channels for 512-beam input


def _perm_torch_to_flax():
    """Index p such that torch_flat[p] == flax_flat ordering."""
    idx = np.arange(_L * _C).reshape(_L, _C)          # flax order (l, c)
    torch_idx = np.arange(_C * _L).reshape(_C, _L)    # torch order (c, l)
    return torch_idx.T.reshape(-1)                    # maps (l, c) -> torch pos


def torch_state_dict_to_flax(sd: dict) -> dict:
    """Convert a reference ``CNNPolicy.state_dict()`` to our params pytree.

    Accepts tensors or numpy arrays as values.
    """
    g = {k: np.asarray(v) for k, v in sd.items()}
    perm = _perm_torch_to_flax()

    def conv(w):  # (out, in, k) -> (k, in, out)
        return np.transpose(w, (2, 1, 0))

    def dense(w):  # (out, in) -> (in, out)
        return np.transpose(w)

    def fc1(w):  # permuted flatten axis
        return np.transpose(w[:, perm])

    def trunk(p):  # p in {"act", "crt"}
        return {
            "Conv_0": {"kernel": conv(g[f"{p}_fea_cv1.weight"]),
                       "bias": g[f"{p}_fea_cv1.bias"]},
            "Conv_1": {"kernel": conv(g[f"{p}_fea_cv2.weight"]),
                       "bias": g[f"{p}_fea_cv2.bias"]},
            "Dense_0": {"kernel": fc1(g[f"{p}_fc1.weight"]),
                        "bias": g[f"{p}_fc1.bias"]},
        }

    return {"params": {
        "logstd": g["logstd"],
        "act_trunk": trunk("act"),
        "crt_trunk": trunk("crt"),
        "act_fc2": {"kernel": dense(g["act_fc2.weight"]), "bias": g["act_fc2.bias"]},
        "actor1": {"kernel": dense(g["actor1.weight"]), "bias": g["actor1.bias"]},
        "actor2": {"kernel": dense(g["actor2.weight"]), "bias": g["actor2.bias"]},
        "crt_fc2": {"kernel": dense(g["crt_fc2.weight"]), "bias": g["crt_fc2.bias"]},
        "critic": {"kernel": dense(g["critic.weight"]), "bias": g["critic.bias"]},
    }}


def flax_params_to_torch_state_dict(params: dict) -> dict:
    """Inverse of :func:`torch_state_dict_to_flax` (numpy values)."""
    p = params["params"]
    perm = _perm_torch_to_flax()
    inv = np.argsort(perm)

    def conv(w):
        return np.transpose(np.asarray(w), (2, 1, 0))

    def dense(w):
        return np.transpose(np.asarray(w))

    def fc1(w):
        return np.transpose(np.asarray(w))[:, inv]

    out = {"logstd": np.asarray(p["logstd"])}
    for pre, t in (("act", p["act_trunk"]), ("crt", p["crt_trunk"])):
        out[f"{pre}_fea_cv1.weight"] = conv(t["Conv_0"]["kernel"])
        out[f"{pre}_fea_cv1.bias"] = np.asarray(t["Conv_0"]["bias"])
        out[f"{pre}_fea_cv2.weight"] = conv(t["Conv_1"]["kernel"])
        out[f"{pre}_fea_cv2.bias"] = np.asarray(t["Conv_1"]["bias"])
        out[f"{pre}_fc1.weight"] = fc1(t["Dense_0"]["kernel"])
        out[f"{pre}_fc1.bias"] = np.asarray(t["Dense_0"]["bias"])
    for name in ("act_fc2", "actor1", "actor2", "crt_fc2", "critic"):
        out[f"{name}.weight"] = dense(p[name]["kernel"])
        out[f"{name}.bias"] = np.asarray(p[name]["bias"])
    return out

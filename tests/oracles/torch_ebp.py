"""Torch-hook excitation-backprop oracle for parity testing.

Implements the EBP algorithm (Zhang et al., ECCV'16, Alg. 1 / eq. 10) with
torch forward/pre-forward/tensor hooks — the same mechanism the reference
uses — so the JAX graph-IR interpreter can be validated event-by-event on
small random networks.  Semantics verified against the published algorithm
and the reference's documented behavior:

  * triple forward (clean / positive-weight-with-input-override / clean)
    with weights swapped to W+ for the backward;
  * per-tensor backward closures computing p = a * relu(z) and rewriting
    the gradient per subtree mode, chaining at fork tensors;
  * per-event prior overrides popped in hook-fire order.

This module lives in tests/ only; it is an oracle, not product code.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

AFFINE = ("Conv", "Linear", "AvgPool", "BatchNorm")
SPECIAL = ("Sigmoid", "ELU", "Tanh")
POOLRELU = ("MaxPool", "ReLU")


def _is_affine(name):
    return any(s in name for s in AFFINE)


class HookEBP:
    """Hook-based EBP over a torch net's leaf modules.

    Args:
      net: torch module (eval mode enforced).
      containers: module classes to recurse into (in addition to
        nn.Sequential), matching the reference layer visitor.
      subtree_mode: one of all / norelu / affineonly / affineonly_with_prior.
    """

    def __init__(self, net: nn.Module, containers=(), eps=1e-12,
                 with_bias=False, subtree_mode="all"):
        self.net = net.eval()
        self.containers = (nn.Sequential,) + tuple(containers)
        self.eps = eps
        self.with_bias = with_bias
        self.subtree_mode = subtree_mode

        self.mode = "disable"
        self._saved = {}      # module -> original weight/bias clones
        self.A = []           # per-call tuples of relu'd inputs (pass 1)
        self.X = []           # per-call tuples of relu'd natural inputs (2)
        self._cursor = 0
        self.P = []           # MWP per hook fire
        self.P_names = []
        self.dA = []          # raw grads per hook fire ('grads' mode)
        self.prior_queue = []  # popped per hook fire

        self._walk(self.net)

    def _walk(self, module):
        for child in module._modules.values():
            if child is None:
                continue
            if isinstance(child, self.containers):
                self._walk(child)
            else:
                child.register_forward_pre_hook(self._pre_hook)
                child.register_forward_hook(self._fwd_hook)

    # -- weight swapping -------------------------------------------------

    def _swap_positive(self, m):
        if hasattr(m, "weight") and m.weight is not None:
            if m not in self._saved:
                self._saved[m] = {}
            if "w" not in self._saved[m]:
                self._saved[m]["w"] = m.weight.detach().clone()
            m.weight.data.copy_(F.relu(self._saved[m]["w"]))
        if self.with_bias and getattr(m, "bias", None) is not None:
            if m not in self._saved:
                self._saved[m] = {}
            if "b" not in self._saved[m]:
                self._saved[m]["b"] = m.bias.detach().clone()
            m.bias.data.copy_(F.relu(self._saved[m]["b"]))

    def _restore(self, m):
        s = self._saved.get(m)
        if not s:
            return
        if "w" in s:
            m.weight.data.copy_(s["w"])
        if "b" in s:
            m.bias.data.copy_(s["b"])

    def restore_all(self):
        for m in list(self._saved):
            self._restore(m)

    # -- hooks -------------------------------------------------------------

    def _pre_hook(self, m, inputs):
        if self.mode == "positive":
            self._swap_positive(m)
            self.X.append(tuple(F.relu(x.detach().clone()) for x in inputs))
            a = self.A[self._cursor]
            self._cursor += 1
            return a
        elif self.mode == "ebp":
            self._restore(m)  # clean forward values
        return None

    def _fwd_hook(self, m, inputs, output):
        if self.mode == "activation":
            for x in inputs:
                x.register_hook(lambda g: (self.dA.append(g), None)[1])
            self.A.append(tuple(F.relu(x.detach().clone()) for x in inputs))
        elif self.mode == "ebp":
            a_call = self.A[self._cursor]
            x_call = self.X[self._cursor]
            self._cursor += 1
            self._swap_positive(m)  # W+ for the backward
            name = type(m).__name__
            for (g, a, x) in zip(inputs, a_call, x_call):
                g.register_hook(self._make_bwd(name, a, x))
        return None

    def _make_bwd(self, name, a, x):
        def bwd(z):
            zh = F.relu(z)
            p = a * zh
            prior = self.prior_queue.pop(0) if self.prior_queue else None
            if prior is not None:
                p = prior.clone()
            self.P.append(p.detach().clone())
            self.P_names.append(name)

            mode = self.subtree_mode
            if any(s in name for s in SPECIAL):
                raise ValueError("special layer %s unsupported" % name)
            if mode == "affineonly":
                return p / (x + self.eps) if _is_affine(name) else None
            elif mode == "affineonly_with_prior":
                zm = (prior > 0).float() * z if prior is not None else zh
                pm = (prior > 0).float() * p if prior is not None else p
                return pm / (x + self.eps) if _is_affine(name) else zm
            elif mode == "norelu":
                if any(s in name for s in POOLRELU) and prior is not None:
                    return None
                return p / (x + self.eps)
            elif mode == "all":
                return p / (x + self.eps)
            raise ValueError(mode)
        return bwd

    # -- drivers -----------------------------------------------------------

    def _clean(self):
        self.A, self.X, self.P, self.P_names, self.dA = [], [], [], [], []
        self._cursor = 0

    def run(self, x, Pn, priors=None):
        """Full EBP.  Returns (P list in fire order, layer names)."""
        self._clean()
        self.prior_queue = list(priors) if priors else []
        x = x.detach().clone()

        self.mode = "activation"
        self.net(x.requires_grad_(True))
        self.mode = "positive"
        self._cursor = 0
        self.net(x.requires_grad_(True))
        self.mode = "ebp"
        self._cursor = 0
        y = self.net(x.requires_grad_(True))
        y.backward(Pn, retain_graph=True)
        self.mode = "disable"
        self.restore_all()
        return list(self.P), list(self.P_names)

    def run_grads(self, x, cotangent):
        """Natural backward: raw grads at every hook-fire point."""
        self._clean()
        self.restore_all()
        self.mode = "activation"
        x = x.detach().clone()
        y = self.net(x.requires_grad_(True))
        y.backward(cotangent, retain_graph=True)
        self.mode = "disable"
        return list(self.dA)

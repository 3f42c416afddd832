import sys
import types

import numpy as np
import torch


def install():
    # ---- torchmetrics.audio.SignalNoiseRatio ----
    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")
        audio = types.ModuleType("torchmetrics.audio")

        class SignalNoiseRatio:
            def __call__(self, preds, target):
                num = torch.sum(target**2)
                den = torch.sum((target - preds) ** 2)
                return 10.0 * torch.log10(num / den)

        audio.SignalNoiseRatio = SignalNoiseRatio
        tm.audio = audio
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.audio"] = audio

    # ---- gpytorch (import-surface only; fit_torch gets monkeypatched) --
    if "gpytorch" not in sys.modules:
        gp = types.ModuleType("gpytorch")

        class _Stub:
            def __init__(self, *a, **k):
                raise RuntimeError("gpytorch stub: fit_torch must be "
                                   "monkeypatched before use")

        models = types.ModuleType("gpytorch.models")
        class ExactGP:  # only referenced via isinstance checks
            def __init__(self, *a, **k):
                raise RuntimeError("gpytorch stub")
        models.ExactGP = ExactGP
        models.ApproximateGP = type("ApproximateGP", (), {})
        variational = types.ModuleType("gpytorch.variational")
        variational.CholeskyVariationalDistribution = _Stub
        variational.VariationalStrategy = _Stub
        constraints = types.ModuleType("gpytorch.constraints")
        constraints.GreaterThan = lambda *a, **k: None
        constraints.Interval = lambda *a, **k: None
        likelihoods = types.ModuleType("gpytorch.likelihoods")
        likelihoods.GaussianLikelihood = _Stub
        mlls = types.ModuleType("gpytorch.mlls")
        mlls.ExactMarginalLogLikelihood = _Stub
        kernels = types.ModuleType("gpytorch.kernels")
        kernels.ScaleKernel = _Stub
        kernels.RBFKernel = _Stub
        kernels.InducingPointKernel = _Stub
        means = types.ModuleType("gpytorch.means")
        means.ConstantMean = _Stub
        means.LinearMean = _Stub
        means.Mean = type("Mean", (), {})
        distributions = types.ModuleType("gpytorch.distributions")
        distributions.MultivariateNormal = _Stub
        settings = types.ModuleType("gpytorch.settings")
        for name, mod in [("models", models), ("variational", variational),
                          ("constraints", constraints),
                          ("likelihoods", likelihoods), ("mlls", mlls),
                          ("kernels", kernels), ("means", means),
                          ("distributions", distributions),
                          ("settings", settings)]:
            setattr(gp, name, mod)
            sys.modules[f"gpytorch.{name}"] = mod
        sys.modules["gpytorch"] = gp

    # ---- pyro (legacy warp + a util_plots top-level import) ----
    if "pyro" not in sys.modules:
        pyro = types.ModuleType("pyro")
        pyro.__path__ = []  # mark as package
        contrib = types.ModuleType("pyro.contrib")
        contrib.__path__ = []
        gp_mod = types.ModuleType("pyro.contrib.gp")
        contrib.gp = gp_mod
        pyro.contrib = contrib
        dist = types.ModuleType("pyro.distributions")
        pyro.distributions = dist
        infer = types.ModuleType("pyro.infer")
        infer.SVI = object; infer.Trace_ELBO = object
        pyro.infer = infer
        optim = types.ModuleType("pyro.optim")
        optim.Adam = object
        pyro.optim = optim
        sys.modules["pyro"] = pyro
        sys.modules["pyro.contrib"] = contrib
        sys.modules["pyro.contrib.gp"] = gp_mod
        sys.modules["pyro.distributions"] = dist
        sys.modules["pyro.infer"] = infer
        sys.modules["pyro.optim"] = optim

    # ---- plotly (util_plots imports it at module load) ----
    if "plotly" not in sys.modules:
        try:
            import plotly  # noqa: F401
        except ImportError:
            plotly = types.ModuleType("plotly")
            plotly.__path__ = []
            gobj = types.ModuleType("plotly.graph_objects")
            class _Any:
                def __init__(self, *a, **k):
                    pass
                def __getattr__(self, name):
                    return _Any()
                def __call__(self, *a, **k):
                    return _Any()
            gobj.Figure = _Any
            gobj.Scatter = _Any
            sub = types.ModuleType("plotly.subplots")
            sub.make_subplots = _Any()
            plotly.graph_objects = gobj
            plotly.subplots = sub
            pio = types.ModuleType("plotly.io")
            pio.renderers = _Any()
            pio.templates = _Any()
            pio.kaleido = _Any()
            plotly.io = pio
            express = types.ModuleType("plotly.express")
            express.__path__ = []
            excolors = types.ModuleType("plotly.express.colors")
            excolors.sample_colorscale = _Any()
            express.colors = excolors
            plotly.express = express
            offline = types.ModuleType("plotly.offline")
            offline.plot = _Any()
            plotly.offline = offline
            sys.modules["plotly"] = plotly
            sys.modules["plotly.graph_objects"] = gobj
            sys.modules["plotly.subplots"] = sub
            sys.modules["plotly.io"] = pio
            sys.modules["plotly.express"] = express
            sys.modules["plotly.express.colors"] = excolors
            sys.modules["plotly.offline"] = offline

    # ---- wfdb (only needed for raw-record ingestion) ----
    if "wfdb" not in sys.modules:
        w = types.ModuleType("wfdb")
        w.processing = types.ModuleType("wfdb.processing")
        sys.modules["wfdb"] = w
        sys.modules["wfdb.processing"] = w.processing


def patch_fit_torch():
    """Replace GPI.fit_torch with an exact-mechanics torch fit (verified
    to match the gpytorch path to 5+ digits: Adam lr=0.1, softplus
    outputscale/lengthscale, Interval noise, ConstantMean, <=4000 iters
    with the 10-step plateau rule, lengthscale pinned to 1.2 on
    write-back)."""
    import hdpgpc.GPI as GPI

    def fit_torch(self, x, y, alpha_ini, gamma_ini, reduced_points=False,
                  verbose=False):
        if self.fitted:
            return self.fitted
        x_ = x.detach().T[0] if x.ndim > 1 else x.detach()
        y_ = y.detach().T[0] if y.ndim > 1 else y.detach()
        lb, ub = self.kernel.k2.noise_level_bounds
        T = x_.shape[0]
        raw_s = torch.zeros((), dtype=torch.float64, requires_grad=True)
        raw_l = torch.zeros((), dtype=torch.float64, requires_grad=True)
        raw_n = torch.zeros((), dtype=torch.float64, requires_grad=True)
        c = torch.zeros((), dtype=torch.float64, requires_grad=True)
        sp = torch.nn.functional.softplus
        opt = torch.optim.Adam([raw_s, raw_l, raw_n, c], lr=0.1)
        d2 = (x_[:, None] - x_[None, :]) ** 2
        losses = []
        for i in range(4000):
            opt.zero_grad()
            s = sp(raw_s); l = sp(raw_l)
            n = lb + (ub - lb) * torch.sigmoid(raw_n)
            K = s * torch.exp(-0.5 * d2 / (l * l)) + n * torch.eye(T)
            L = torch.linalg.cholesky(K)
            r = (y_ - c).reshape(T, 1)
            a = torch.cholesky_solve(r, L)
            ll = (-0.5 * torch.sum(r * a) - torch.sum(torch.log(torch.diag(L)))
                  - 0.5 * T * np.log(2 * np.pi))
            loss = -ll / T
            loss.backward()
            losses.append(loss.item())
            opt.step()
            if len(losses) > 1000:
                if np.isclose(np.sum(np.subtract(losses[-10:],
                                                 losses[-11:-1])), 0,
                              atol=1e-4):
                    break
        # write-back exactly as the reference's ExactGPModel branch
        # (GPI.py:706-714): outputscale, lengthscale pinned to 1.2, noise
        if hasattr(self.kernel.k1, "k1"):
            self.kernel.k1.k1.theta = np.log(
                np.array([sp(raw_s).item()]))
        if hasattr(self.kernel.k1, "k2"):
            self.kernel.k1.k2.theta = np.log(np.array([1.2]))
        else:
            self.kernel.k1.theta = np.log(np.array([sp(raw_l).item()]))
        n_fin = (lb + (ub - lb) * torch.sigmoid(raw_n)).item()
        self.kernel.k2.theta = np.log(np.array([n_fin]))
        x__ = self.cond_to_numpy(self.x_basis)
        self.K_X_X = self.cond_to_torch(self.kernel(x__, x__))
        self.K_inv = self.inv_r("kernelMat", self.K_X_X)
        self.fitted = True
        try:
            idm = torch.eye(self.x_basis.shape[0])
            alph_ = self.cond_to_torch(self.kernel.k2.noise_level) * idm
            gam_ = self.cond_to_torch(gamma_ini) * idm
            self.assign_alpha_ini(alph_, gam_)
        except AttributeError:
            self.assign_alpha_ini(alpha_ini, gamma_ini)
        return self.fitted

    GPI.IterativeGaussianProcess.fit_torch = fit_torch


def patch_warp_empty_max():
    """Make the reference's online warp path runnable: compute_warp_y
    crashes whenever self.M == 1 because ``liks[-1] = liks[-1] +
    torch.max(liks[:-1])`` reduces an EMPTY tensor (GPI_HDP.py:3226,
    :3248, :3313) — i.e. beat 2 of EVERY online warp run (including the
    reference's own tests/test_online_warp.py config) raises
    ``RuntimeError: max(): Expected reduction dim to be specified for
    input.numel() == 0`` under this torch version.

    Shim semantics: a max over an empty tensor contributes the additive
    identity 0.0, leaving the single existing model's lik unshifted —
    at M == 1 there is no competing candidate, so no accept/reject
    decision can change. Every other torch.max call passes through
    untouched."""
    import hdpgpc.GPI_HDP as mod
    real = mod.torch
    if getattr(mod.torch, "_warp_empty_max_shim", False):
        return

    class _TorchShim:
        _warp_empty_max_shim = True

        def __getattr__(self, name):
            return getattr(real, name)

        @staticmethod
        def max(*a, **k):
            if (len(a) == 1 and not k and hasattr(a[0], "numel")
                    and a[0].numel() == 0):
                return real.zeros((), dtype=a[0].dtype)
            return real.max(*a, **k)

    mod.torch = _TorchShim()

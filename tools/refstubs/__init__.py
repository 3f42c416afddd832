"""Import stubs that let the (read-only) reference implementation run in
this image for golden-trace generation: gpytorch / torchmetrics / pyro
are not installed; the reference only exercises them in fit_torch (which
the harness monkeypatches with a parity-verified fit), SNR computation
(reimplemented in torch below) and the legacy warp (unused).
"""
import sys, types

"""Inference runtimes (offline strategies, streaming, host drivers).

``Inferencer`` is re-exported lazily (PEP 562): the AOT serving load path
(``fullsubnet_tpu.serving``) imports the leaf ``infer.host`` module and
must not drag in the model/engine stack (see
``tools/onchip_verify.py``'s no-model-code subprocess check).
"""


def __getattr__(name):
    if name == "Inferencer":
        from fullsubnet_tpu.infer.inferencer import Inferencer

        return Inferencer
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

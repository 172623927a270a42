from tpuserve.quant.core import (  # noqa: F401
    QTensor,
    dequantize,
    qmatmul,
    quantize,
    quantize_param_tree,
)

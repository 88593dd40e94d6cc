"""brever_tpu — a TPU-native speech enhancement framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the
``philgzl/brever`` research framework (reference: /root/reference):
a noisy/reverberant mixture simulator, a flax model zoo for speech
enhancement, and a PESQ/STOI/SNR evaluation harness — designed around
TPU hardware (static shapes, sharded-jit data parallelism, bf16 matmuls).
"""

__version__ = '0.1.0'

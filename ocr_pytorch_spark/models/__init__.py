"""Model-forward kernels (CTPN detection, CRNN recognition) and their
deterministic fixture weights/alphabet."""

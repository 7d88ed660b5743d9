"""Binlog binary layer: decode kernels, frame scan, fixture encoder."""

"""Interoperability with the PyTorch reference implementation."""

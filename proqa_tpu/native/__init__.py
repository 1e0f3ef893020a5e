"""Native (C++) host-side components, loaded via ctypes with on-demand build."""

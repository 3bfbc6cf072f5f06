"""Shared-state helpers: broadcast small sides once via ray.put."""

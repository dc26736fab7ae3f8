from .binary import attach_fake_payload, extract_binary_features

__all__ = ["attach_fake_payload", "extract_binary_features"]

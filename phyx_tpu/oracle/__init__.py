from phyx_tpu.oracle.engine import OracleWorld, collide_box_box_np

__all__ = ["OracleWorld", "collide_box_box_np"]

from hupr_tpu.utils.plot import plot_human_pose

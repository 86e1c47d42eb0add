from fbs_tpu.dsb.ipf import ipf_loss_disc, ipf_loss_cont, ipf_loss_cont_v

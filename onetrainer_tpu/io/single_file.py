"""Single-file checkpoint conversion for SD3 / FLUX / PixArt
(reference: modules/util/convert/convert_sd3_diffusers_to_ckpt.py,
convert_flux_diffusers_to_ckpt.py, convert_pixart_diffusers_to_ckpt.py —
same key tables, numpy instead of torch; both directions so files
round-trip exactly).

Input/output dicts are flat diffusers-style torch state dicts (as produced
by the per-family *_flax_to_state_dict converters)."""

from __future__ import annotations

import os

import numpy as np


def _combine(left: str, right: str) -> str:
    if not left:
        return right
    if not right:
        return left
    return f"{left}.{right}"


def _swap_chunks(t: np.ndarray) -> np.ndarray:
    a, b = np.split(t, 2, axis=0)
    return np.concatenate([b, a], axis=0)


def _map_wb(out, ins, out_prefix, in_prefix):
    out[_combine(out_prefix, "weight")] = ins[_combine(in_prefix, "weight")]
    out[_combine(out_prefix, "bias")] = ins[_combine(in_prefix, "bias")]


def _unmap_wb(out, ins, out_prefix, in_prefix):
    out[_combine(out_prefix, "weight")] = ins[_combine(in_prefix, "weight")]
    out[_combine(out_prefix, "bias")] = ins[_combine(in_prefix, "bias")]


def _cat(ins, keys):
    return np.concatenate([np.asarray(ins[k]) for k in keys], axis=0)


def _split3(out, ins, key, out_keys):
    parts = np.split(np.asarray(ins[key]), len(out_keys), axis=0)
    for name, part in zip(out_keys, parts):
        out[name] = part


# -- FLUX (BFL single-file layout) ---------------------------------------------------

def flux_transformer_to_bfl(sd: dict) -> dict:
    """diffusers FluxTransformer2DModel keys -> BFL keys
    (reference: convert_flux_diffusers_to_ckpt.py:11-118)."""
    out: dict = {}
    _map_wb(out, sd, "txt_in", "context_embedder")
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        _map_wb(out, sd, "guidance_in.in_layer",
                "time_text_embed.guidance_embedder.linear_1")
        _map_wb(out, sd, "guidance_in.out_layer",
                "time_text_embed.guidance_embedder.linear_2")
    _map_wb(out, sd, "vector_in.in_layer",
            "time_text_embed.text_embedder.linear_1")
    _map_wb(out, sd, "vector_in.out_layer",
            "time_text_embed.text_embedder.linear_2")
    _map_wb(out, sd, "time_in.in_layer",
            "time_text_embed.timestep_embedder.linear_1")
    _map_wb(out, sd, "time_in.out_layer",
            "time_text_embed.timestep_embedder.linear_2")
    out["final_layer.adaLN_modulation.1.weight"] = \
        _swap_chunks(sd["norm_out.linear.weight"])
    out["final_layer.adaLN_modulation.1.bias"] = \
        _swap_chunks(sd["norm_out.linear.bias"])
    _map_wb(out, sd, "final_layer.linear", "proj_out")
    _map_wb(out, sd, "img_in", "x_embedder")

    i = 0
    while f"transformer_blocks.{i}.attn.to_q.weight" in sd:
        ip, op = f"transformer_blocks.{i}", f"double_blocks.{i}"
        for wb in ("weight", "bias"):
            out[f"{op}.img_attn.qkv.{wb}"] = _cat(sd, [
                f"{ip}.attn.to_q.{wb}", f"{ip}.attn.to_k.{wb}",
                f"{ip}.attn.to_v.{wb}"])
            out[f"{op}.txt_attn.qkv.{wb}"] = _cat(sd, [
                f"{ip}.attn.add_q_proj.{wb}", f"{ip}.attn.add_k_proj.{wb}",
                f"{ip}.attn.add_v_proj.{wb}"])
        out[f"{op}.img_attn.norm.query_norm.scale"] = sd[f"{ip}.attn.norm_q.weight"]
        out[f"{op}.img_attn.norm.key_norm.scale"] = sd[f"{ip}.attn.norm_k.weight"]
        out[f"{op}.txt_attn.norm.query_norm.scale"] = sd[f"{ip}.attn.norm_added_q.weight"]
        out[f"{op}.txt_attn.norm.key_norm.scale"] = sd[f"{ip}.attn.norm_added_k.weight"]
        _map_wb(out, sd, f"{op}.img_attn.proj", f"{ip}.attn.to_out.0")
        _map_wb(out, sd, f"{op}.img_mlp.0", f"{ip}.ff.net.0.proj")
        _map_wb(out, sd, f"{op}.img_mlp.2", f"{ip}.ff.net.2")
        _map_wb(out, sd, f"{op}.img_mod.lin", f"{ip}.norm1.linear")
        _map_wb(out, sd, f"{op}.txt_attn.proj", f"{ip}.attn.to_add_out")
        _map_wb(out, sd, f"{op}.txt_mlp.0", f"{ip}.ff_context.net.0.proj")
        _map_wb(out, sd, f"{op}.txt_mlp.2", f"{ip}.ff_context.net.2")
        _map_wb(out, sd, f"{op}.txt_mod.lin", f"{ip}.norm1_context.linear")
        i += 1

    i = 0
    while f"single_transformer_blocks.{i}.attn.to_q.weight" in sd:
        ip, op = f"single_transformer_blocks.{i}", f"single_blocks.{i}"
        for wb in ("weight", "bias"):
            out[f"{op}.linear1.{wb}"] = _cat(sd, [
                f"{ip}.attn.to_q.{wb}", f"{ip}.attn.to_k.{wb}",
                f"{ip}.attn.to_v.{wb}", f"{ip}.proj_mlp.{wb}"])
        out[f"{op}.norm.query_norm.scale"] = sd[f"{ip}.attn.norm_q.weight"]
        out[f"{op}.norm.key_norm.scale"] = sd[f"{ip}.attn.norm_k.weight"]
        _map_wb(out, sd, f"{op}.linear2", f"{ip}.proj_out")
        _map_wb(out, sd, f"{op}.modulation.lin", f"{ip}.norm.linear")
        i += 1
    return out


def flux_bfl_to_transformer(sd: dict) -> dict:
    """Inverse of flux_transformer_to_bfl."""
    out: dict = {}
    _map_wb(out, sd, "context_embedder", "txt_in")
    if "guidance_in.in_layer.weight" in sd:
        _map_wb(out, sd, "time_text_embed.guidance_embedder.linear_1",
                "guidance_in.in_layer")
        _map_wb(out, sd, "time_text_embed.guidance_embedder.linear_2",
                "guidance_in.out_layer")
    _map_wb(out, sd, "time_text_embed.text_embedder.linear_1",
            "vector_in.in_layer")
    _map_wb(out, sd, "time_text_embed.text_embedder.linear_2",
            "vector_in.out_layer")
    _map_wb(out, sd, "time_text_embed.timestep_embedder.linear_1",
            "time_in.in_layer")
    _map_wb(out, sd, "time_text_embed.timestep_embedder.linear_2",
            "time_in.out_layer")
    out["norm_out.linear.weight"] = \
        _swap_chunks(sd["final_layer.adaLN_modulation.1.weight"])
    out["norm_out.linear.bias"] = \
        _swap_chunks(sd["final_layer.adaLN_modulation.1.bias"])
    _map_wb(out, sd, "proj_out", "final_layer.linear")
    _map_wb(out, sd, "x_embedder", "img_in")

    i = 0
    while f"double_blocks.{i}.img_attn.qkv.weight" in sd:
        ip, op = f"double_blocks.{i}", f"transformer_blocks.{i}"
        for wb in ("weight", "bias"):
            _split3(out, sd, f"{ip}.img_attn.qkv.{wb}",
                    [f"{op}.attn.to_q.{wb}", f"{op}.attn.to_k.{wb}",
                     f"{op}.attn.to_v.{wb}"])
            _split3(out, sd, f"{ip}.txt_attn.qkv.{wb}",
                    [f"{op}.attn.add_q_proj.{wb}", f"{op}.attn.add_k_proj.{wb}",
                     f"{op}.attn.add_v_proj.{wb}"])
        out[f"{op}.attn.norm_q.weight"] = sd[f"{ip}.img_attn.norm.query_norm.scale"]
        out[f"{op}.attn.norm_k.weight"] = sd[f"{ip}.img_attn.norm.key_norm.scale"]
        out[f"{op}.attn.norm_added_q.weight"] = sd[f"{ip}.txt_attn.norm.query_norm.scale"]
        out[f"{op}.attn.norm_added_k.weight"] = sd[f"{ip}.txt_attn.norm.key_norm.scale"]
        _map_wb(out, sd, f"{op}.attn.to_out.0", f"{ip}.img_attn.proj")
        _map_wb(out, sd, f"{op}.ff.net.0.proj", f"{ip}.img_mlp.0")
        _map_wb(out, sd, f"{op}.ff.net.2", f"{ip}.img_mlp.2")
        _map_wb(out, sd, f"{op}.norm1.linear", f"{ip}.img_mod.lin")
        _map_wb(out, sd, f"{op}.attn.to_add_out", f"{ip}.txt_attn.proj")
        _map_wb(out, sd, f"{op}.ff_context.net.0.proj", f"{ip}.txt_mlp.0")
        _map_wb(out, sd, f"{op}.ff_context.net.2", f"{ip}.txt_mlp.2")
        _map_wb(out, sd, f"{op}.norm1_context.linear", f"{ip}.txt_mod.lin")
        i += 1

    i = 0
    while f"single_blocks.{i}.linear1.weight" in sd:
        ip, op = f"single_blocks.{i}", f"single_transformer_blocks.{i}"
        for wb in ("weight", "bias"):
            fused = np.asarray(sd[f"{ip}.linear1.{wb}"])
            hidden = np.asarray(sd[f"{ip}.linear2.weight"]).shape[0]
            q, k, v, mlp = np.split(fused, [hidden, 2 * hidden, 3 * hidden],
                                    axis=0)
            out[f"{op}.attn.to_q.{wb}"] = q
            out[f"{op}.attn.to_k.{wb}"] = k
            out[f"{op}.attn.to_v.{wb}"] = v
            out[f"{op}.proj_mlp.{wb}"] = mlp
        out[f"{op}.attn.norm_q.weight"] = sd[f"{ip}.norm.query_norm.scale"]
        out[f"{op}.attn.norm_k.weight"] = sd[f"{ip}.norm.key_norm.scale"]
        _map_wb(out, sd, f"{op}.proj_out", f"{ip}.linear2")
        _map_wb(out, sd, f"{op}.norm.linear", f"{ip}.modulation.lin")
        i += 1
    return out


# -- SD3 (SAI single-file layout) ------------------------------------------------------

def sd3_transformer_to_sai(sd: dict) -> dict:
    """diffusers SD3Transformer2DModel -> sai 'model.diffusion_model.*'
    inner keys (reference: convert_sd3_diffusers_to_ckpt.py:11-107)."""
    out: dict = {}
    if "pos_embed.pos_embed" in sd:
        out["pos_embed"] = sd["pos_embed.pos_embed"]
    _map_wb(out, sd, "x_embedder.proj", "pos_embed.proj")
    _map_wb(out, sd, "context_embedder", "context_embedder")
    out["final_layer.adaLN_modulation.1.weight"] = \
        _swap_chunks(sd["norm_out.linear.weight"])
    out["final_layer.adaLN_modulation.1.bias"] = \
        _swap_chunks(sd["norm_out.linear.bias"])
    _map_wb(out, sd, "final_layer.linear", "proj_out")
    _map_wb(out, sd, "t_embedder.mlp.0",
            "time_text_embed.timestep_embedder.linear_1")
    _map_wb(out, sd, "t_embedder.mlp.2",
            "time_text_embed.timestep_embedder.linear_2")
    _map_wb(out, sd, "y_embedder.mlp.0",
            "time_text_embed.text_embedder.linear_1")
    _map_wb(out, sd, "y_embedder.mlp.2",
            "time_text_embed.text_embedder.linear_2")

    i = 0
    while f"transformer_blocks.{i}.attn.to_q.weight" in sd:
        ip, op = f"transformer_blocks.{i}", f"joint_blocks.{i}"
        is_last = f"transformer_blocks.{i + 1}.attn.to_q.weight" not in sd
        for wb in ("weight", "bias"):
            out[f"{op}.x_block.attn.qkv.{wb}"] = _cat(sd, [
                f"{ip}.attn.to_q.{wb}", f"{ip}.attn.to_k.{wb}",
                f"{ip}.attn.to_v.{wb}"])
            out[f"{op}.context_block.attn.qkv.{wb}"] = _cat(sd, [
                f"{ip}.attn.add_q_proj.{wb}", f"{ip}.attn.add_k_proj.{wb}",
                f"{ip}.attn.add_v_proj.{wb}"])
        _map_wb(out, sd, f"{op}.x_block.attn.proj", f"{ip}.attn.to_out.0")
        _map_wb(out, sd, f"{op}.x_block.adaLN_modulation.1", f"{ip}.norm1.linear")
        if not is_last:
            _map_wb(out, sd, f"{op}.context_block.attn.proj",
                    f"{ip}.attn.to_add_out")
            _map_wb(out, sd, f"{op}.context_block.adaLN_modulation.1",
                    f"{ip}.norm1_context.linear")
            _map_wb(out, sd, f"{op}.context_block.mlp.fc1",
                    f"{ip}.ff_context.net.0.proj")
            _map_wb(out, sd, f"{op}.context_block.mlp.fc2",
                    f"{ip}.ff_context.net.2")
        else:
            out[f"{op}.context_block.adaLN_modulation.1.weight"] = \
                _swap_chunks(sd[f"{ip}.norm1_context.linear.weight"])
            out[f"{op}.context_block.adaLN_modulation.1.bias"] = \
                _swap_chunks(sd[f"{ip}.norm1_context.linear.bias"])
        if f"{ip}.attn.norm_q.weight" in sd:          # SD3.5 qk norms
            out[f"{op}.x_block.attn.ln_q.weight"] = sd[f"{ip}.attn.norm_q.weight"]
            out[f"{op}.x_block.attn.ln_k.weight"] = sd[f"{ip}.attn.norm_k.weight"]
        if f"{ip}.attn.norm_added_q.weight" in sd:
            out[f"{op}.context_block.attn.ln_q.weight"] = \
                sd[f"{ip}.attn.norm_added_q.weight"]
            out[f"{op}.context_block.attn.ln_k.weight"] = \
                sd[f"{ip}.attn.norm_added_k.weight"]
        _map_wb(out, sd, f"{op}.x_block.mlp.fc1", f"{ip}.ff.net.0.proj")
        _map_wb(out, sd, f"{op}.x_block.mlp.fc2", f"{ip}.ff.net.2")
        i += 1
    return out


def sd3_sai_to_transformer(sd: dict) -> dict:
    """Inverse of sd3_transformer_to_sai."""
    out: dict = {}
    if "pos_embed" in sd:
        out["pos_embed.pos_embed"] = sd["pos_embed"]
    _map_wb(out, sd, "pos_embed.proj", "x_embedder.proj")
    _map_wb(out, sd, "context_embedder", "context_embedder")
    out["norm_out.linear.weight"] = \
        _swap_chunks(sd["final_layer.adaLN_modulation.1.weight"])
    out["norm_out.linear.bias"] = \
        _swap_chunks(sd["final_layer.adaLN_modulation.1.bias"])
    _map_wb(out, sd, "proj_out", "final_layer.linear")
    _map_wb(out, sd, "time_text_embed.timestep_embedder.linear_1",
            "t_embedder.mlp.0")
    _map_wb(out, sd, "time_text_embed.timestep_embedder.linear_2",
            "t_embedder.mlp.2")
    _map_wb(out, sd, "time_text_embed.text_embedder.linear_1",
            "y_embedder.mlp.0")
    _map_wb(out, sd, "time_text_embed.text_embedder.linear_2",
            "y_embedder.mlp.2")

    i = 0
    while f"joint_blocks.{i}.x_block.attn.qkv.weight" in sd:
        ip, op = f"joint_blocks.{i}", f"transformer_blocks.{i}"
        is_last = f"joint_blocks.{i + 1}.x_block.attn.qkv.weight" not in sd
        for wb in ("weight", "bias"):
            _split3(out, sd, f"{ip}.x_block.attn.qkv.{wb}",
                    [f"{op}.attn.to_q.{wb}", f"{op}.attn.to_k.{wb}",
                     f"{op}.attn.to_v.{wb}"])
            _split3(out, sd, f"{ip}.context_block.attn.qkv.{wb}",
                    [f"{op}.attn.add_q_proj.{wb}", f"{op}.attn.add_k_proj.{wb}",
                     f"{op}.attn.add_v_proj.{wb}"])
        _map_wb(out, sd, f"{op}.attn.to_out.0", f"{ip}.x_block.attn.proj")
        _map_wb(out, sd, f"{op}.norm1.linear", f"{ip}.x_block.adaLN_modulation.1")
        if not is_last:
            _map_wb(out, sd, f"{op}.attn.to_add_out",
                    f"{ip}.context_block.attn.proj")
            _map_wb(out, sd, f"{op}.norm1_context.linear",
                    f"{ip}.context_block.adaLN_modulation.1")
            _map_wb(out, sd, f"{op}.ff_context.net.0.proj",
                    f"{ip}.context_block.mlp.fc1")
            _map_wb(out, sd, f"{op}.ff_context.net.2",
                    f"{ip}.context_block.mlp.fc2")
        else:
            out[f"{op}.norm1_context.linear.weight"] = \
                _swap_chunks(sd[f"{ip}.context_block.adaLN_modulation.1.weight"])
            out[f"{op}.norm1_context.linear.bias"] = \
                _swap_chunks(sd[f"{ip}.context_block.adaLN_modulation.1.bias"])
        if f"{ip}.x_block.attn.ln_q.weight" in sd:
            out[f"{op}.attn.norm_q.weight"] = sd[f"{ip}.x_block.attn.ln_q.weight"]
            out[f"{op}.attn.norm_k.weight"] = sd[f"{ip}.x_block.attn.ln_k.weight"]
        if f"{ip}.context_block.attn.ln_q.weight" in sd:
            out[f"{op}.attn.norm_added_q.weight"] = \
                sd[f"{ip}.context_block.attn.ln_q.weight"]
            out[f"{op}.attn.norm_added_k.weight"] = \
                sd[f"{ip}.context_block.attn.ln_k.weight"]
        _map_wb(out, sd, f"{op}.ff.net.0.proj", f"{ip}.x_block.mlp.fc1")
        _map_wb(out, sd, f"{op}.ff.net.2", f"{ip}.x_block.mlp.fc2")
        i += 1
    return out


# -- PixArt (original repo single-file layout) -----------------------------------------

def pixart_transformer_to_ckpt(sd: dict) -> dict:
    """diffusers PixArtTransformer2DModel -> original PixArt repo keys
    (reference: convert_pixart_diffusers_to_ckpt.py:10-110; the y_embedding
    and pos_embed buffers are re-generated downstream)."""
    out: dict = {}
    _map_wb(out, sd, "y_embedder.y_proj.fc1", "caption_projection.linear_1")
    _map_wb(out, sd, "y_embedder.y_proj.fc2", "caption_projection.linear_2")
    _map_wb(out, sd, "x_embedder.proj", "pos_embed.proj")
    _map_wb(out, sd, "t_embedder.mlp.0",
            "adaln_single.emb.timestep_embedder.linear_1")
    _map_wb(out, sd, "t_embedder.mlp.2",
            "adaln_single.emb.timestep_embedder.linear_2")
    _map_wb(out, sd, "t_block.1", "adaln_single.linear")
    # alpha-1024 micro-condition embedders (reference maps them in the
    # is_pixart_alpha() branch, convert_pixart_diffusers_to_ckpt.py:73-78);
    # presence-gated: sigma and alpha-512 checkpoints don't have them
    if "adaln_single.emb.aspect_ratio_embedder.linear_1.weight" in sd:
        _map_wb(out, sd, "ar_embedder.mlp.0",
                "adaln_single.emb.aspect_ratio_embedder.linear_1")
        _map_wb(out, sd, "ar_embedder.mlp.2",
                "adaln_single.emb.aspect_ratio_embedder.linear_2")
        _map_wb(out, sd, "csize_embedder.mlp.0",
                "adaln_single.emb.resolution_embedder.linear_1")
        _map_wb(out, sd, "csize_embedder.mlp.2",
                "adaln_single.emb.resolution_embedder.linear_2")
    i = 0
    while f"transformer_blocks.{i}.attn1.to_q.weight" in sd:
        ip, op = f"transformer_blocks.{i}", f"blocks.{i}"
        for wb in ("weight", "bias"):
            out[f"{op}.attn.qkv.{wb}"] = _cat(sd, [
                f"{ip}.attn1.to_q.{wb}", f"{ip}.attn1.to_k.{wb}",
                f"{ip}.attn1.to_v.{wb}"])
            out[f"{op}.cross_attn.kv_linear.{wb}"] = _cat(sd, [
                f"{ip}.attn2.to_k.{wb}", f"{ip}.attn2.to_v.{wb}"])
        _map_wb(out, sd, f"{op}.attn.proj", f"{ip}.attn1.to_out.0")
        _map_wb(out, sd, f"{op}.cross_attn.q_linear", f"{ip}.attn2.to_q")
        _map_wb(out, sd, f"{op}.cross_attn.proj", f"{ip}.attn2.to_out.0")
        _map_wb(out, sd, f"{op}.mlp.fc1", f"{ip}.ff.net.0.proj")
        _map_wb(out, sd, f"{op}.mlp.fc2", f"{ip}.ff.net.2")
        out[f"{op}.scale_shift_table"] = sd[f"{ip}.scale_shift_table"]
        i += 1
    _map_wb(out, sd, "final_layer.linear", "proj_out")
    out["final_layer.scale_shift_table"] = sd["scale_shift_table"]
    return out


def pixart_ckpt_to_transformer(sd: dict) -> dict:
    """Inverse of pixart_transformer_to_ckpt (generated buffers dropped)."""
    out: dict = {}
    _map_wb(out, sd, "caption_projection.linear_1", "y_embedder.y_proj.fc1")
    _map_wb(out, sd, "caption_projection.linear_2", "y_embedder.y_proj.fc2")
    _map_wb(out, sd, "pos_embed.proj", "x_embedder.proj")
    _map_wb(out, sd, "adaln_single.emb.timestep_embedder.linear_1",
            "t_embedder.mlp.0")
    _map_wb(out, sd, "adaln_single.emb.timestep_embedder.linear_2",
            "t_embedder.mlp.2")
    _map_wb(out, sd, "adaln_single.linear", "t_block.1")
    if "ar_embedder.mlp.0.weight" in sd:
        _map_wb(out, sd, "adaln_single.emb.aspect_ratio_embedder.linear_1",
                "ar_embedder.mlp.0")
        _map_wb(out, sd, "adaln_single.emb.aspect_ratio_embedder.linear_2",
                "ar_embedder.mlp.2")
        _map_wb(out, sd, "adaln_single.emb.resolution_embedder.linear_1",
                "csize_embedder.mlp.0")
        _map_wb(out, sd, "adaln_single.emb.resolution_embedder.linear_2",
                "csize_embedder.mlp.2")
    i = 0
    while f"blocks.{i}.attn.qkv.weight" in sd:
        ip, op = f"blocks.{i}", f"transformer_blocks.{i}"
        for wb in ("weight", "bias"):
            _split3(out, sd, f"{ip}.attn.qkv.{wb}",
                    [f"{op}.attn1.to_q.{wb}", f"{op}.attn1.to_k.{wb}",
                     f"{op}.attn1.to_v.{wb}"])
            kv = np.split(np.asarray(sd[f"{ip}.cross_attn.kv_linear.{wb}"]),
                          2, axis=0)
            out[f"{op}.attn2.to_k.{wb}"] = kv[0]
            out[f"{op}.attn2.to_v.{wb}"] = kv[1]
        _map_wb(out, sd, f"{op}.attn1.to_out.0", f"{ip}.attn.proj")
        _map_wb(out, sd, f"{op}.attn2.to_q", f"{ip}.cross_attn.q_linear")
        _map_wb(out, sd, f"{op}.attn2.to_out.0", f"{ip}.cross_attn.proj")
        _map_wb(out, sd, f"{op}.ff.net.0.proj", f"{ip}.mlp.fc1")
        _map_wb(out, sd, f"{op}.ff.net.2", f"{ip}.mlp.fc2")
        out[f"{op}.scale_shift_table"] = sd[f"{ip}.scale_shift_table"]
        i += 1
    _map_wb(out, sd, "proj_out", "final_layer.linear")
    out["scale_shift_table"] = sd["final_layer.scale_shift_table"]
    return out


# -- single-file full-checkpoint loaders ---------------------------------------------
# The reference loads FLUX/SD3/PixArt from single safetensors files via
# diffusers *.from_single_file (reference: FluxModelLoader.__load_safetensors:
# 157-230, StableDiffusion3ModelLoader, PixArtAlphaModelLoader.__load_ckpt).
# Zero-egress equivalent: every component present in the file loads; missing
# text encoders / VAE stay None (the reference prints "... not loaded,
# continuing without it" for the same case).

def _strip_prefix(sd: dict, prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def _infer_clip_config(hf_sd: dict, compute_dtype):
    """CLIP text config from an HF-format state dict's shapes."""
    from onetrainer_tpu.models.clip import CLIPTextConfig
    emb = hf_sd["text_model.embeddings.token_embedding.weight"]
    vocab, hidden = emb.shape
    layers = 1 + max(int(k.split(".")[3]) for k in hf_sd
                     if k.startswith("text_model.encoder.layers."))
    inter = hf_sd["text_model.encoder.layers.0.mlp.fc1.weight"].shape[0]
    proj = hf_sd.get("text_projection.weight")
    return CLIPTextConfig(
        vocab_size=int(vocab), hidden_size=int(hidden),
        intermediate_size=int(inter), num_layers=layers,
        num_heads=int(hidden) // 64,
        max_position_embeddings=int(
            hf_sd["text_model.embeddings.position_embedding.weight"].shape[0]),
        hidden_act="quick_gelu" if hidden == 768 else "gelu",
        projection_dim=int(proj.shape[0]) if proj is not None else None,
        dtype=compute_dtype)


def _infer_t5_config(hf_sd: dict, compute_dtype):
    from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
    d_model = int(hf_sd["shared.weight"].shape[1])
    layers = 1 + max(int(k.split(".")[2]) for k in hf_sd
                     if k.startswith("encoder.block."))
    d_ff = int(hf_sd["encoder.block.0.layer.1.DenseReluDense.wi_0.weight"]
               .shape[0])
    inner = int(hf_sd["encoder.block.0.layer.0.SelfAttention.q.weight"]
                .shape[0])
    return t5_config_from_transformers({
        "vocab_size": int(hf_sd["shared.weight"].shape[0]),
        "d_model": d_model, "d_ff": d_ff, "num_layers": layers,
        "d_kv": 64, "num_heads": inner // 64,
    }, compute_dtype)


def _single_file_te_params(tensors: dict, np_dtype, to_jnp, compute_dtype):
    """Extract clip_l / clip_g / t5xxl from SAI 'text_encoders.*' keys."""
    from onetrainer_tpu.io.sd_checkpoints import _cast_tree
    from onetrainer_tpu.io.torch_flax import (
        clip_state_dict_to_flax, t5_state_dict_to_flax,
    )
    out = {}
    for name, conv, infer in (
            ("clip_l", clip_state_dict_to_flax, _infer_clip_config),
            ("clip_g", clip_state_dict_to_flax, _infer_clip_config),
            ("t5xxl", t5_state_dict_to_flax, _infer_t5_config)):
        sub = _strip_prefix(tensors, f"text_encoders.{name}.transformer.")
        if sub:
            out[name] = (infer(sub, compute_dtype),
                         to_jnp(conv(_cast_tree(sub, np_dtype))))
        else:
            out[name] = (None, None)
    return out


def _single_file_vae(tensors: dict, np_dtype, to_jnp, compute_dtype,
                     latent_channels, scaling_factor, shift_factor=None):
    from dataclasses import replace

    from onetrainer_tpu.io.ldm import convert_vae_ldm_to_diffusers
    from onetrainer_tpu.io.sd_checkpoints import (
        _cast_tree, vae_config_from_diffusers,
    )
    from onetrainer_tpu.io.torch_flax import vae_state_dict_to_flax

    ldm_vae = _strip_prefix(tensors, "first_stage_model.")
    if not ldm_vae:
        ldm_vae = _strip_prefix(tensors, "vae.")
    if not ldm_vae:
        return None, None
    diff_sd = convert_vae_ldm_to_diffusers(ldm_vae)
    cfg = replace(vae_config_from_diffusers({}, compute_dtype),
                  latent_channels=latent_channels,
                  scaling_factor=scaling_factor, shift_factor=shift_factor)
    return cfg, to_jnp(vae_state_dict_to_flax(_cast_tree(diff_sd, np_dtype)))


def load_flux_single_file(path: str, weight_dtype=np.float32,
                          compute_dtype=None, gradient_checkpointing=False,
                          device: bool = True):
    """BFL single-file FLUX checkpoint (transformer required; VAE/TEs
    loaded when bundled). Returns the load_flux_diffusers dict shape."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from onetrainer_tpu.io.flux_checkpoints import flux_config_from_diffusers
    from onetrainer_tpu.io.sd_checkpoints import _cast_tree, _read_single_file
    from onetrainer_tpu.io.torch_flax import unet_state_dict_to_flax

    compute_dtype = compute_dtype or jnp.bfloat16
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    to_jnp = (lambda t: jax.tree.map(jnp.asarray, t)) if device else (lambda t: t)

    tensors = _read_single_file(path)
    bfl = _strip_prefix(tensors, "model.diffusion_model.")
    if not any(k.startswith("double_blocks.") for k in bfl):
        bfl = {k: v for k, v in tensors.items()
               if k.startswith(("double_blocks.", "single_blocks.", "img_in.",
                                "txt_in.", "time_in.", "vector_in.",
                                "guidance_in.", "final_layer."))}
    diff_sd = flux_bfl_to_transformer(bfl)

    n_double = 1 + max((int(k.split(".")[1]) for k in diff_sd
                        if k.startswith("transformer_blocks.")), default=-1)
    n_single = 1 + max((int(k.split(".")[1]) for k in diff_sd
                        if k.startswith("single_transformer_blocks.")),
                       default=-1)
    hidden = int(diff_sd["transformer_blocks.0.attn.to_q.weight"].shape[0])
    in_ch = int(diff_sd["x_embedder.weight"].shape[1])
    tcfg = flux_config_from_diffusers({
        "in_channels": in_ch, "num_layers": n_double,
        "num_single_layers": n_single, "num_attention_heads": 24,
        "attention_head_dim": hidden // 24,
        "guidance_embeds":
            "time_text_embed.guidance_embedder.linear_1.weight" in diff_sd,
    }, compute_dtype, gradient_checkpointing)

    vae_cfg, vae_params = _single_file_vae(
        tensors, np_dtype, to_jnp, compute_dtype,
        latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159)
    tes = _single_file_te_params(tensors, np_dtype, to_jnp, compute_dtype)

    # missing components: default configs (reference prints "... not
    # loaded, continuing without it"); params stay None
    from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
    from onetrainer_tpu.models.clip import clip_vit_l_config
    from onetrainer_tpu.models.vae import flux_vae_config
    for name, present in (("vae", vae_params is not None),
                          ("text encoder 1 (clip l)", tes["clip_l"][1] is not None),
                          ("text encoder 2 (t5)", tes["t5xxl"][1] is not None)):
        if not present:
            print(f"{name} not in single-file checkpoint, "
                  "continuing without it")

    return {
        "transformer_config": tcfg,
        "vae_config": vae_cfg or flux_vae_config(dtype=compute_dtype),
        "te_config": tes["clip_l"][0] or clip_vit_l_config(dtype=compute_dtype),
        "te2_config": tes["t5xxl"][0] or t5_config_from_transformers(
            {}, compute_dtype),
        "transformer_params": to_jnp(
            unet_state_dict_to_flax(_cast_tree(diff_sd, np_dtype))),
        "vae_params": vae_params,
        "te_params": tes["clip_l"][1],
        "te2_params": tes["t5xxl"][1],
        "tokenizer_dir": None,
        "tokenizer_2_dir": None,
        "prediction_type": "flow",
    }


def load_sd3_single_file(path: str, weight_dtype=np.float32,
                         compute_dtype=None, gradient_checkpointing=False,
                         device: bool = True):
    """SAI single-file SD3/3.5 checkpoint (model.diffusion_model.* MMDiT +
    first_stage_model.* VAE + text_encoders.*). Returns the
    load_sd3_diffusers dict shape."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from onetrainer_tpu.io.sd3_checkpoints import sd3_config_from_diffusers
    from onetrainer_tpu.io.sd_checkpoints import _cast_tree, _read_single_file
    from onetrainer_tpu.io.torch_flax import unet_state_dict_to_flax

    compute_dtype = compute_dtype or jnp.bfloat16
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    to_jnp = (lambda t: jax.tree.map(jnp.asarray, t)) if device else (lambda t: t)

    tensors = _read_single_file(path)
    sai = _strip_prefix(tensors, "model.diffusion_model.")
    diff_sd = sd3_sai_to_transformer(sai)

    n_layers = 1 + max(int(k.split(".")[1]) for k in diff_sd
                       if k.startswith("transformer_blocks."))
    caption_dim = int(diff_sd["context_embedder.weight"].shape[0])
    in_ch = int(diff_sd["pos_embed.proj.weight"].shape[1])
    pos_embed = diff_sd.get("pos_embed.pos_embed")
    pos_max = int(round(pos_embed.shape[-2] ** 0.5)) if pos_embed is not None \
        and pos_embed.ndim >= 2 else 192
    tcfg = sd3_config_from_diffusers({
        "num_layers": n_layers, "in_channels": in_ch, "out_channels": in_ch,
        "num_attention_heads": caption_dim // 64, "attention_head_dim": 64,
        "caption_projection_dim": caption_dim,
        "pos_embed_max_size": pos_max,
        "qk_norm": "rms_norm"
        if "transformer_blocks.0.attn.norm_q.weight" in diff_sd else None,
    }, compute_dtype, gradient_checkpointing)

    vae_cfg, vae_params = _single_file_vae(
        tensors, np_dtype, to_jnp, compute_dtype,
        latent_channels=16, scaling_factor=1.5305, shift_factor=0.0609)
    tes = _single_file_te_params(tensors, np_dtype, to_jnp, compute_dtype)

    from dataclasses import replace as _replace

    from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
    from onetrainer_tpu.models.clip import (
        clip_vit_l_config, open_clip_vit_bigg_config,
    )
    from onetrainer_tpu.models.vae import flux_vae_config
    if vae_cfg is None:
        vae_cfg = _replace(flux_vae_config(dtype=compute_dtype),
                           scaling_factor=1.5305, shift_factor=0.0609)
    for name, present in (("vae", vae_params is not None),
                          ("clip_l", tes["clip_l"][1] is not None),
                          ("clip_g", tes["clip_g"][1] is not None),
                          ("t5xxl", tes["t5xxl"][1] is not None)):
        if not present:
            print(f"{name} not in single-file checkpoint, "
                  "continuing without it")

    return {
        "transformer_config": tcfg,
        "vae_config": vae_cfg,
        "te_config": tes["clip_l"][0] or clip_vit_l_config(
            projection_dim=768, dtype=compute_dtype),
        "te2_config": tes["clip_g"][0] or open_clip_vit_bigg_config(
            dtype=compute_dtype),
        "te3_config": tes["t5xxl"][0] or t5_config_from_transformers(
            {}, compute_dtype),
        "transformer_params": to_jnp(
            unet_state_dict_to_flax(_cast_tree(diff_sd, np_dtype))),
        "vae_params": vae_params,
        "te_params": tes["clip_l"][1],
        "te2_params": tes["clip_g"][1],
        "te3_params": tes["t5xxl"][1],
        "tokenizer_dir": None,
        "tokenizer_2_dir": None,
        "tokenizer_3_dir": None,
        "prediction_type": "flow",
    }


def load_pixart_single_file(path: str, weight_dtype=np.float32,
                            compute_dtype=None,
                            gradient_checkpointing=False,
                            device: bool = True):
    """PixArt original-repo single-file checkpoint (transformer only;
    reference: PixArtAlphaModelLoader ckpt path). VAE/T5 stay None."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from onetrainer_tpu.io.pixart_checkpoints import (
        pixart_config_from_diffusers,
    )
    from onetrainer_tpu.io.sd_checkpoints import _cast_tree, _read_single_file
    from onetrainer_tpu.io.torch_flax import unet_state_dict_to_flax

    compute_dtype = compute_dtype or jnp.bfloat16
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    to_jnp = (lambda t: jax.tree.map(jnp.asarray, t)) if device else (lambda t: t)

    tensors = _read_single_file(path)
    diff_sd = pixart_ckpt_to_transformer(tensors)

    n_layers = 1 + max(int(k.split(".")[1]) for k in diff_sd
                       if k.startswith("transformer_blocks."))
    hidden = int(diff_sd["transformer_blocks.0.attn1.to_q.weight"].shape[0])
    in_ch = int(diff_sd["pos_embed.proj.weight"].shape[1])
    out_ch = int(diff_sd["proj_out.weight"].shape[0]) // 4
    tcfg = pixart_config_from_diffusers({
        "num_layers": n_layers, "in_channels": in_ch, "out_channels": out_ch,
        "num_attention_heads": 16, "attention_head_dim": hidden // 16,
        # alpha-1024 micro-conditions travel with the checkpoint
        "use_additional_conditions":
            "adaln_single.emb.aspect_ratio_embedder.linear_1.weight"
            in diff_sd,
    }, compute_dtype, gradient_checkpointing)

    from onetrainer_tpu.io.flux_checkpoints import t5_config_from_transformers
    from onetrainer_tpu.models.vae import sd15_vae_config
    print("vae / t5 not in single-file checkpoint, continuing without them")
    return {
        "transformer_config": tcfg,
        "vae_config": sd15_vae_config(dtype=compute_dtype),
        "te_config": t5_config_from_transformers({}, compute_dtype),
        "transformer_params": to_jnp(
            unet_state_dict_to_flax(_cast_tree(diff_sd, np_dtype))),
        "vae_params": None,
        "te_params": None,
        "tokenizer_dir": None,
        "prediction_type": "epsilon",
    }


# -- HunyuanVideo (original-repo ckpt layout) -----------------------------------------

def hunyuan_transformer_to_ckpt(sd: dict, prefix: str = "model.model") -> dict:
    """diffusers HunyuanVideoTransformer3DModel keys -> original-repo ckpt
    keys (reference: convert_hunyuan_video_diffusers_to_ckpt.py:64-149)."""
    out: dict = {}

    def put(ok, ik):
        out[_combine(prefix, ok)] = sd[ik]

    def put_wb(op, ip):
        for wb in ("weight", "bias"):
            put(f"{op}.{wb}", f"{ip}.{wb}")

    put_wb("txt_in.c_embedder.in_layer",
           "context_embedder.time_text_embed.text_embedder.linear_1")
    put_wb("txt_in.c_embedder.out_layer",
           "context_embedder.time_text_embed.text_embedder.linear_2")
    put_wb("txt_in.t_embedder.in_layer",
           "context_embedder.time_text_embed.timestep_embedder.linear_1")
    put_wb("txt_in.t_embedder.out_layer",
           "context_embedder.time_text_embed.timestep_embedder.linear_2")
    put_wb("txt_in.input_embedder", "context_embedder.proj_in")
    out[_combine(prefix, "final_layer.adaLN_modulation.1.weight")] = \
        _swap_chunks(np.asarray(sd["norm_out.linear.weight"]))
    out[_combine(prefix, "final_layer.adaLN_modulation.1.bias")] = \
        _swap_chunks(np.asarray(sd["norm_out.linear.bias"]))
    put_wb("final_layer.linear", "proj_out")
    if "time_text_embed.guidance_embedder.linear_1.weight" in sd:
        # guidance-distilled models only (guidance_embeds=False variants
        # like SkyReels ship without these)
        put_wb("guidance_in.in_layer",
               "time_text_embed.guidance_embedder.linear_1")
        put_wb("guidance_in.out_layer",
               "time_text_embed.guidance_embedder.linear_2")
    put_wb("vector_in.in_layer", "time_text_embed.text_embedder.linear_1")
    put_wb("vector_in.out_layer", "time_text_embed.text_embedder.linear_2")
    put_wb("time_in.in_layer", "time_text_embed.timestep_embedder.linear_1")
    put_wb("time_in.out_layer", "time_text_embed.timestep_embedder.linear_2")
    put_wb("img_in.proj", "x_embedder.proj")

    i = 0
    while f"context_embedder.token_refiner.refiner_blocks.{i}.attn.to_q.weight" in sd:
        ip = f"context_embedder.token_refiner.refiner_blocks.{i}"
        op = f"txt_in.individual_token_refiner.blocks.{i}"
        for wb in ("weight", "bias"):
            out[_combine(prefix, f"{op}.self_attn.qkv.{wb}")] = _cat(sd, [
                f"{ip}.attn.to_q.{wb}", f"{ip}.attn.to_k.{wb}",
                f"{ip}.attn.to_v.{wb}"])
        put_wb(f"{op}.self_attn.proj", f"{ip}.attn.to_out.0")
        put_wb(f"{op}.mlp.0", f"{ip}.ff.net.0.proj")
        put_wb(f"{op}.mlp.2", f"{ip}.ff.net.2")
        put_wb(f"{op}.adaLN_modulation.1", f"{ip}.norm_out.linear")
        put_wb(f"{op}.norm1", f"{ip}.norm1")
        put_wb(f"{op}.norm2", f"{ip}.norm2")
        i += 1

    i = 0
    while f"transformer_blocks.{i}.attn.to_q.weight" in sd:
        ip, op = f"transformer_blocks.{i}", f"double_blocks.{i}"
        for wb in ("weight", "bias"):
            out[_combine(prefix, f"{op}.img_attn.qkv.{wb}")] = _cat(sd, [
                f"{ip}.attn.to_q.{wb}", f"{ip}.attn.to_k.{wb}",
                f"{ip}.attn.to_v.{wb}"])
            out[_combine(prefix, f"{op}.txt_attn.qkv.{wb}")] = _cat(sd, [
                f"{ip}.attn.add_q_proj.{wb}", f"{ip}.attn.add_k_proj.{wb}",
                f"{ip}.attn.add_v_proj.{wb}"])
        put(f"{op}.img_attn.norm.query_norm.scale", f"{ip}.attn.norm_q.weight")
        put(f"{op}.img_attn.norm.key_norm.scale", f"{ip}.attn.norm_k.weight")
        put(f"{op}.txt_attn.norm.query_norm.scale",
            f"{ip}.attn.norm_added_q.weight")
        put(f"{op}.txt_attn.norm.key_norm.scale",
            f"{ip}.attn.norm_added_k.weight")
        put_wb(f"{op}.img_attn.proj", f"{ip}.attn.to_out.0")
        put_wb(f"{op}.img_mlp.0", f"{ip}.ff.net.0.proj")
        put_wb(f"{op}.img_mlp.2", f"{ip}.ff.net.2")
        put_wb(f"{op}.img_mod.lin", f"{ip}.norm1.linear")
        put_wb(f"{op}.txt_attn.proj", f"{ip}.attn.to_add_out")
        put_wb(f"{op}.txt_mlp.0", f"{ip}.ff_context.net.0.proj")
        put_wb(f"{op}.txt_mlp.2", f"{ip}.ff_context.net.2")
        put_wb(f"{op}.txt_mod.lin", f"{ip}.norm1_context.linear")
        i += 1

    i = 0
    while f"single_transformer_blocks.{i}.attn.to_q.weight" in sd:
        ip, op = f"single_transformer_blocks.{i}", f"single_blocks.{i}"
        for wb in ("weight", "bias"):
            out[_combine(prefix, f"{op}.linear1.{wb}")] = _cat(sd, [
                f"{ip}.attn.to_q.{wb}", f"{ip}.attn.to_k.{wb}",
                f"{ip}.attn.to_v.{wb}", f"{ip}.proj_mlp.{wb}"])
        put(f"{op}.norm.query_norm.scale", f"{ip}.attn.norm_q.weight")
        put(f"{op}.norm.key_norm.scale", f"{ip}.attn.norm_k.weight")
        put_wb(f"{op}.linear2", f"{ip}.proj_out")
        put_wb(f"{op}.modulation.lin", f"{ip}.norm.linear")
        i += 1
    return out


def hunyuan_ckpt_to_transformer(sd: dict, prefix: str = "model.model") -> dict:
    """Inverse of hunyuan_transformer_to_ckpt (original ckpt -> diffusers)."""
    sd = {k[len(prefix) + 1:] if prefix and k.startswith(prefix + ".") else k: v
          for k, v in sd.items()}
    out: dict = {}

    def put_wb(op, ip):
        for wb in ("weight", "bias"):
            out[f"{op}.{wb}"] = sd[f"{ip}.{wb}"]

    put_wb("context_embedder.time_text_embed.text_embedder.linear_1",
           "txt_in.c_embedder.in_layer")
    put_wb("context_embedder.time_text_embed.text_embedder.linear_2",
           "txt_in.c_embedder.out_layer")
    put_wb("context_embedder.time_text_embed.timestep_embedder.linear_1",
           "txt_in.t_embedder.in_layer")
    put_wb("context_embedder.time_text_embed.timestep_embedder.linear_2",
           "txt_in.t_embedder.out_layer")
    put_wb("context_embedder.proj_in", "txt_in.input_embedder")
    out["norm_out.linear.weight"] = _swap_chunks(
        np.asarray(sd["final_layer.adaLN_modulation.1.weight"]))
    out["norm_out.linear.bias"] = _swap_chunks(
        np.asarray(sd["final_layer.adaLN_modulation.1.bias"]))
    put_wb("proj_out", "final_layer.linear")
    if "guidance_in.in_layer.weight" in sd:
        put_wb("time_text_embed.guidance_embedder.linear_1",
               "guidance_in.in_layer")
        put_wb("time_text_embed.guidance_embedder.linear_2",
               "guidance_in.out_layer")
    put_wb("time_text_embed.text_embedder.linear_1", "vector_in.in_layer")
    put_wb("time_text_embed.text_embedder.linear_2", "vector_in.out_layer")
    put_wb("time_text_embed.timestep_embedder.linear_1", "time_in.in_layer")
    put_wb("time_text_embed.timestep_embedder.linear_2", "time_in.out_layer")
    put_wb("x_embedder.proj", "img_in.proj")

    i = 0
    while f"txt_in.individual_token_refiner.blocks.{i}.self_attn.qkv.weight" in sd:
        ip = f"txt_in.individual_token_refiner.blocks.{i}"
        op = f"context_embedder.token_refiner.refiner_blocks.{i}"
        for wb in ("weight", "bias"):
            _split3(out, sd, f"{ip}.self_attn.qkv.{wb}", [
                f"{op}.attn.to_q.{wb}", f"{op}.attn.to_k.{wb}",
                f"{op}.attn.to_v.{wb}"])
        put_wb(f"{op}.attn.to_out.0", f"{ip}.self_attn.proj")
        put_wb(f"{op}.ff.net.0.proj", f"{ip}.mlp.0")
        put_wb(f"{op}.ff.net.2", f"{ip}.mlp.2")
        put_wb(f"{op}.norm_out.linear", f"{ip}.adaLN_modulation.1")
        put_wb(f"{op}.norm1", f"{ip}.norm1")
        put_wb(f"{op}.norm2", f"{ip}.norm2")
        i += 1

    i = 0
    while f"double_blocks.{i}.img_attn.qkv.weight" in sd:
        ip, op = f"double_blocks.{i}", f"transformer_blocks.{i}"
        for wb in ("weight", "bias"):
            _split3(out, sd, f"{ip}.img_attn.qkv.{wb}", [
                f"{op}.attn.to_q.{wb}", f"{op}.attn.to_k.{wb}",
                f"{op}.attn.to_v.{wb}"])
            _split3(out, sd, f"{ip}.txt_attn.qkv.{wb}", [
                f"{op}.attn.add_q_proj.{wb}", f"{op}.attn.add_k_proj.{wb}",
                f"{op}.attn.add_v_proj.{wb}"])
        out[f"{op}.attn.norm_q.weight"] = sd[f"{ip}.img_attn.norm.query_norm.scale"]
        out[f"{op}.attn.norm_k.weight"] = sd[f"{ip}.img_attn.norm.key_norm.scale"]
        out[f"{op}.attn.norm_added_q.weight"] = \
            sd[f"{ip}.txt_attn.norm.query_norm.scale"]
        out[f"{op}.attn.norm_added_k.weight"] = \
            sd[f"{ip}.txt_attn.norm.key_norm.scale"]
        put_wb(f"{op}.attn.to_out.0", f"{ip}.img_attn.proj")
        put_wb(f"{op}.ff.net.0.proj", f"{ip}.img_mlp.0")
        put_wb(f"{op}.ff.net.2", f"{ip}.img_mlp.2")
        put_wb(f"{op}.norm1.linear", f"{ip}.img_mod.lin")
        put_wb(f"{op}.attn.to_add_out", f"{ip}.txt_attn.proj")
        put_wb(f"{op}.ff_context.net.0.proj", f"{ip}.txt_mlp.0")
        put_wb(f"{op}.ff_context.net.2", f"{ip}.txt_mlp.2")
        put_wb(f"{op}.norm1_context.linear", f"{ip}.txt_mod.lin")
        i += 1

    i = 0
    while f"single_blocks.{i}.linear1.weight" in sd:
        ip, op = f"single_blocks.{i}", f"single_transformer_blocks.{i}"
        hidden = np.asarray(sd[f"{ip}.linear2.weight"]).shape[0]
        for wb in ("weight", "bias"):
            fused = np.asarray(sd[f"{ip}.linear1.{wb}"])
            q, k, v, mlp = np.split(
                fused, [hidden, 2 * hidden, 3 * hidden], axis=0)
            out[f"{op}.attn.to_q.{wb}"] = q
            out[f"{op}.attn.to_k.{wb}"] = k
            out[f"{op}.attn.to_v.{wb}"] = v
            out[f"{op}.proj_mlp.{wb}"] = mlp
        out[f"{op}.attn.norm_q.weight"] = sd[f"{ip}.norm.query_norm.scale"]
        out[f"{op}.attn.norm_k.weight"] = sd[f"{ip}.norm.key_norm.scale"]
        put_wb(f"{op}.proj_out", f"{ip}.linear2")
        put_wb(f"{op}.norm.linear", f"{ip}.modulation.lin")
        i += 1
    return out


# -- Stable Cascade (stage_c single-file layout) --------------------------------------

def cascade_prior_to_ckpt(sd: dict) -> dict:
    """diffusers StableCascadeUNet keys -> stage_c.safetensors keys: fuse
    to_q/to_k/to_v into attention.attn.in_proj_*, rename to_out.0 ->
    attn.out_proj; everything else is key-identical
    (reference: convert_stable_cascade_diffusers_to_ckpt.py:32-50)."""
    out: dict = {}
    for key, value in sd.items():
        if ".attention.to_out.0." in key:
            out[key.replace(".attention.to_out.0.",
                            ".attention.attn.out_proj.")] = value
        elif ".attention.to_q." in key:
            base, wb = key.rsplit(".", 1)
            stem = base[: -len(".attention.to_q")]
            suffix = "in_proj_weight" if wb == "weight" else "in_proj_bias"
            out[f"{stem}.attention.attn.{suffix}"] = _cat(sd, [
                f"{stem}.attention.to_q.{wb}",
                f"{stem}.attention.to_k.{wb}",
                f"{stem}.attention.to_v.{wb}"])
        elif ".attention.to_k." in key or ".attention.to_v." in key:
            continue
        else:
            out[key] = value
    return out


def cascade_ckpt_to_prior(sd: dict) -> dict:
    """Inverse of cascade_prior_to_ckpt (stage_c -> diffusers)."""
    out: dict = {}
    for key, value in sd.items():
        if ".attention.attn.out_proj." in key:
            out[key.replace(".attention.attn.out_proj.",
                            ".attention.to_out.0.")] = value
        elif key.endswith(".attention.attn.in_proj_weight") or \
                key.endswith(".attention.attn.in_proj_bias"):
            stem = key[: key.index(".attention.attn.in_proj_")]
            wb = "weight" if key.endswith("weight") else "bias"
            _split3(out, sd, key, [
                f"{stem}.attention.to_q.{wb}",
                f"{stem}.attention.to_k.{wb}",
                f"{stem}.attention.to_v.{wb}"])
        else:
            out[key] = value
    return out


def load_hunyuan_single_file(path: str, weight_dtype=np.float32,
                             compute_dtype=None,
                             gradient_checkpointing=False,
                             device: bool = True):
    """HunyuanVideo original-repo single-file checkpoint (transformer only,
    `model.model.*` prefix; reference: HunyuanVideoModelLoader
    __load_safetensors via from_single_file). VAE / Llama / CLIP stay None."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from onetrainer_tpu.io.hunyuan_checkpoints import (
        hunyuan_config_from_diffusers, hunyuan_state_dict_to_flax,
        llama_config_from_transformers, video_vae_config_from_diffusers,
    )
    from onetrainer_tpu.io.sd_checkpoints import (
        _cast_tree, _read_single_file, clip_config_from_transformers,
    )

    compute_dtype = compute_dtype or jnp.bfloat16
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    to_jnp = (lambda t: jax.tree.map(jnp.asarray, t)) if device else (lambda t: t)

    tensors = _read_single_file(path)
    prefix = "model.model" if any(
        k.startswith("model.model.") for k in tensors) else ""
    diff_sd = hunyuan_ckpt_to_transformer(tensors, prefix=prefix)

    n_double = 1 + max((int(k.split(".")[1]) for k in diff_sd
                        if k.startswith("transformer_blocks.")), default=-1)
    n_single = 1 + max((int(k.split(".")[1]) for k in diff_sd
                        if k.startswith("single_transformer_blocks.")),
                       default=-1)
    n_refiner = 1 + max(
        (int(k.split(".")[3]) for k in diff_sd
         if k.startswith("context_embedder.token_refiner.refiner_blocks.")),
        default=-1)
    xw = np.asarray(diff_sd["x_embedder.proj.weight"])
    hidden, in_ch = int(xw.shape[0]), int(xw.shape[1])
    # qk-norm scale length == head_dim
    head_dim = int(np.asarray(
        diff_sd["transformer_blocks.0.attn.norm_q.weight"]).shape[0]) \
        if "transformer_blocks.0.attn.norm_q.weight" in diff_sd else 128
    tcfg = hunyuan_config_from_diffusers({
        "num_layers": n_double, "num_single_layers": n_single,
        "num_refiner_layers": n_refiner,
        "in_channels": in_ch,
        "out_channels": int(np.asarray(diff_sd["proj_out.weight"]).shape[0])
        // 4,   # t_patch=1, p=2x2 -> out*4
        "num_attention_heads": hidden // head_dim,
        "attention_head_dim": head_dim,
        "text_embed_dim": int(np.asarray(
            diff_sd["context_embedder.proj_in.weight"]).shape[1]),
        "pooled_projection_dim": int(np.asarray(
            diff_sd["time_text_embed.text_embedder.linear_1.weight"]).shape[1]),
        "guidance_embeds":
            "time_text_embed.guidance_embedder.linear_1.weight" in diff_sd,
    }, compute_dtype, gradient_checkpointing)

    print("vae / text encoders not in single-file checkpoint, "
          "continuing without them")
    return {
        "transformer_config": tcfg,
        "vae_config": video_vae_config_from_diffusers({}, compute_dtype),
        "te_config": llama_config_from_transformers({}, compute_dtype),
        "te2_config": clip_config_from_transformers({}, compute_dtype),
        "transformer_params": to_jnp(
            hunyuan_state_dict_to_flax(_cast_tree(diff_sd, np_dtype))),
        "vae_params": None,
        "te_params": None,
        "te2_params": None,
        "tokenizer_dir": None,
        "tokenizer_2_dir": None,
        "prediction_type": "flow",
    }


def load_cascade_single_file(path: str, weight_dtype=np.float32,
                             compute_dtype=None,
                             gradient_checkpointing=False,
                             device: bool = True,
                             effnet_path: str | None = None):
    """Stable Cascade stage_c.safetensors (fused in_proj attention keys;
    reference: WuerstchenModelLoader single-file branch). A sibling
    text_encoder.safetensors is picked up when present; the EfficientNet
    encoder loads from `effnet_path` like the diffusers branch."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from onetrainer_tpu.io.sd_checkpoints import (
        _cast_tree, _read_single_file, clip_config_from_transformers,
    )
    from onetrainer_tpu.io.torch_flax import clip_state_dict_to_flax
    from onetrainer_tpu.io.wuerstchen_checkpoints import (
        prior_config_from_diffusers, prior_state_dict_to_flax,
    )
    from onetrainer_tpu.models.wuerstchen import EffnetConfig

    compute_dtype = compute_dtype or jnp.bfloat16
    np_dtype = {jnp.bfloat16: ml_dtypes.bfloat16}.get(weight_dtype, weight_dtype)
    to_jnp = (lambda t: jax.tree.map(jnp.asarray, t)) if device else (lambda t: t)

    tensors = _read_single_file(path)
    diff_sd = cascade_ckpt_to_prior(tensors)

    def _count(prefix):
        seen = set()
        for k in diff_sd:
            if k.startswith(prefix):
                seen.add(int(k[len(prefix):].split(".")[0]))
        return 1 + max(seen) if seen else 0

    emb = np.asarray(diff_sd["embedding.1.weight"])
    hidden0 = int(emb.shape[0])
    hidden1 = int(np.asarray(
        diff_sd["down_downscalers.1.1.blocks.0.weight"]).shape[0]) \
        if "down_downscalers.1.1.blocks.0.weight" in diff_sd else hidden0
    # head_dim is 64 across Cascade variants (stage_c 2048/32, lite
    # 1536/24) — infer per-level head counts so lite files don't silently
    # load with the full-model's 32 heads
    pcfg = prior_config_from_diffusers({
        "_class_name": "StableCascadeUNet",
        "in_channels": int(np.asarray(diff_sd["clf.1.weight"]).shape[0]) // 4,
        "block_out_channels": (hidden0, hidden1),
        "num_attention_heads": (hidden0 // 64, hidden1 // 64),
        "down_num_layers_per_block": (_count("down_blocks.0.") // 3,
                                      _count("down_blocks.1.") // 3),
        "clip_text_in_channels": int(np.asarray(
            diff_sd["clip_txt_mapper.weight"]).shape[1]),
        "clip_text_pooled_in_channels": int(np.asarray(
            diff_sd["clip_txt_pooled_mapper.weight"]).shape[1]),
        "clip_image_in_channels": int(np.asarray(
            diff_sd["clip_img_mapper.weight"]).shape[1]),
    }, compute_dtype, gradient_checkpointing)

    te_path = os.path.join(os.path.dirname(path) or ".",
                           "text_encoder.safetensors")
    te_params = None
    tcfg_dict: dict = {}
    if os.path.isfile(te_path):
        te_sd = _read_single_file(te_path)
        tcfg_dict = {"hidden_size": int(np.asarray(te_sd[
            "text_model.embeddings.token_embedding.weight"]).shape[1])}
        te_params = to_jnp(clip_state_dict_to_flax(_cast_tree(te_sd, np_dtype)))
    else:
        print("text_encoder.safetensors not found next to stage_c, "
              "continuing without the text encoder")

    effnet_params = None
    if effnet_path and os.path.isfile(effnet_path):
        from onetrainer_tpu.io.safetensors_io import load_safetensors
        from onetrainer_tpu.io.wuerstchen_checkpoints import (
            effnet_state_dict_to_flax,
        )
        sd = load_safetensors(effnet_path)
        sd = {k: np.asarray(v).astype(np_dtype)
              if np.issubdtype(np.asarray(v).dtype, np.floating) else v
              for k, v in sd.items()}
        effnet_params = to_jnp(effnet_state_dict_to_flax(sd))

    return {
        "prior_config": pcfg,
        "effnet_config": EffnetConfig(dtype=compute_dtype),
        "te_config": clip_config_from_transformers(tcfg_dict, compute_dtype),
        "prior_params": to_jnp(
            prior_state_dict_to_flax(_cast_tree(diff_sd, np_dtype))),
        "effnet_params": effnet_params,
        "te_params": te_params,
        "tokenizer_dir": None,
        "prediction_type": "epsilon",
    }

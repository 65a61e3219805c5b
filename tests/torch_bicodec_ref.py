"""Torch reference implementation of the SparkTTS BiCodec module tree
(test-only; canonical parameter names). Used by the converter round-trip
and codec-loader tests."""

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------------
# torch reference modules (public SparkTTS BiCodec tree, test-only)
# --------------------------------------------------------------------------

def WNConv1d(*a, **k):
    return nn.utils.weight_norm(nn.Conv1d(*a, **k))


def WNConvTranspose1d(*a, **k):
    return nn.utils.weight_norm(nn.ConvTranspose1d(*a, **k))


class Snake1d(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = nn.Parameter(torch.rand(1, c, 1) + 0.5)

    def forward(self, x):
        return x + (self.alpha + 1e-9).reciprocal() \
            * torch.sin(self.alpha * x).pow(2)


class AdaLayerNorm(nn.Module):
    def __init__(self, cond_dim, dim):
        super().__init__()
        self.dim = dim
        self.scale = nn.Linear(cond_dim, dim)
        self.shift = nn.Linear(cond_dim, dim)

    def forward(self, x, cond):
        return F.layer_norm(x, (self.dim,), eps=1e-6) \
            * self.scale(cond).unsqueeze(1) + self.shift(cond).unsqueeze(1)


class ConvNeXtBlock(nn.Module):
    def __init__(self, dim, inter, n_layers, cond_dim=None):
        super().__init__()
        self.dwconv = nn.Conv1d(dim, dim, 7, padding=3, groups=dim)
        self.adanorm = cond_dim is not None
        self.norm = (AdaLayerNorm(cond_dim, dim) if cond_dim
                     else nn.LayerNorm(dim, eps=1e-6))
        self.pwconv1 = nn.Linear(dim, inter)
        self.pwconv2 = nn.Linear(inter, dim)
        self.gamma = nn.Parameter(torch.ones(dim) / n_layers)

    def forward(self, x, cond=None):            # x [B, D, T]
        res = x
        x = self.dwconv(x).transpose(1, 2)
        x = self.norm(x, cond) if self.adanorm else self.norm(x)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        return res + (self.gamma * x).transpose(1, 2)


class VocosBackbone(nn.Module):
    def __init__(self, c_in, dim, inter, layers, cond_dim=None):
        super().__init__()
        self.embed = nn.Conv1d(c_in, dim, 7, padding=3)
        self.adanorm = cond_dim is not None
        self.norm = (AdaLayerNorm(cond_dim, dim) if cond_dim
                     else nn.LayerNorm(dim, eps=1e-6))
        self.convnext = nn.ModuleList(
            [ConvNeXtBlock(dim, inter, layers, cond_dim)
             for _ in range(layers)])
        self.final_layer_norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x, cond=None):            # x [B, C_in, T]
        x = self.embed(x).transpose(1, 2)
        x = self.norm(x, cond) if self.adanorm else self.norm(x)
        x = x.transpose(1, 2)
        for blk in self.convnext:
            x = blk(x, cond)
        return self.final_layer_norm(x.transpose(1, 2))   # [B, T, D]


class SamplingBlock(nn.Module):
    """ratio-1: transpose only (the shipped config)."""

    def forward(self, x):                        # [B, T, D] → [B, D, T]
        return x.transpose(1, 2)


class StageSeq(nn.Module):
    def __init__(self, dim, inter):
        super().__init__()
        self.add_module("0", SamplingBlock())
        self.add_module("1", VocosBackbone(dim, dim, inter, 2))

    def forward(self, x):
        return getattr(self, "1")(getattr(self, "0")(x))


class Encoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = VocosBackbone(cfg.feat_dim, cfg.encoder_dim,
                                     cfg.encoder_inter_dim,
                                     cfg.encoder_layers)
        self.downsample = nn.Sequential(*[
            StageSeq(cfg.encoder_dim, cfg.encoder_inter_dim)
            for _ in cfg.encoder_ratios])
        self.project = nn.Linear(cfg.encoder_dim, cfg.encoder_out)

    def forward(self, feats):                    # [B, feat, T]
        x = self.encoder(feats)
        x = self.downsample(x)
        return self.project(x).transpose(1, 2)   # [B, out, T]


class FactorizedVQ(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.in_project = WNConv1d(cfg.encoder_out, cfg.codebook_dim, 1)
        self.out_project = WNConv1d(cfg.codebook_dim, cfg.encoder_out, 1)
        self.codebook = nn.Embedding(cfg.semantic_codebook, cfg.codebook_dim)

    def tokenize(self, z):
        ze = self.in_project(z)
        enc = F.normalize(ze.transpose(1, 2).reshape(-1, ze.shape[1]))
        cb = F.normalize(self.codebook.weight)
        d = (enc.pow(2).sum(1, keepdim=True) - 2 * enc @ cb.t()
             + cb.pow(2).sum(1))
        return d.argmin(1).view(z.shape[0], -1)

    def detokenize(self, idx):
        zq = F.embedding(idx, self.codebook.weight).transpose(1, 2)
        return self.out_project(zq)


class Conv1dReluBn(nn.Module):
    def __init__(self, i, o, k, padding=0, dilation=1):
        super().__init__()
        self.conv = nn.Conv1d(i, o, k, padding=padding, dilation=dilation)
        self.bn = nn.BatchNorm1d(o)

    def forward(self, x):
        return self.bn(F.relu(self.conv(x)))


class Res2Conv1dReluBn(nn.Module):
    def __init__(self, ch, k, padding, dilation, scale):
        super().__init__()
        self.scale = scale
        w = ch // scale
        self.convs = nn.ModuleList(
            [nn.Conv1d(w, w, k, padding=padding, dilation=dilation)
             for _ in range(scale - 1)])
        self.bns = nn.ModuleList(
            [nn.BatchNorm1d(w) for _ in range(scale - 1)])

    def forward(self, x):
        parts = torch.split(x, x.shape[1] // self.scale, 1)
        outs, sp = [], None
        for i, (cv, bn) in enumerate(zip(self.convs, self.bns)):
            sp = parts[i] if i == 0 else sp + parts[i]
            sp = bn(F.relu(cv(sp)))
            outs.append(sp)
        outs.append(parts[-1])
        return torch.cat(outs, 1)


class SE_Connect(nn.Module):
    def __init__(self, ch, bott=128):
        super().__init__()
        self.linear1 = nn.Linear(ch, bott)
        self.linear2 = nn.Linear(bott, ch)

    def forward(self, x):
        s = torch.sigmoid(self.linear2(F.relu(self.linear1(x.mean(2)))))
        return x * s.unsqueeze(2)


class SE_Res2Block(nn.Module):
    def __init__(self, ch, dilation):
        super().__init__()
        self.Conv1dReluBn1 = Conv1dReluBn(ch, ch, 1)
        self.Res2Conv1dReluBn = Res2Conv1dReluBn(ch, 3, dilation, dilation, 8)
        self.Conv1dReluBn2 = Conv1dReluBn(ch, ch, 1)
        self.SE_Connect = SE_Connect(ch)

    def forward(self, x):
        return self.SE_Connect(self.Conv1dReluBn2(
            self.Res2Conv1dReluBn(self.Conv1dReluBn1(x)))) + x


class ASTP(nn.Module):
    def __init__(self, in_dim, bott=128):
        super().__init__()
        self.linear1 = nn.Conv1d(in_dim * 3, bott, 1)
        self.linear2 = nn.Conv1d(bott, in_dim, 1)

    def forward(self, x):
        mean = x.mean(-1, keepdim=True).expand_as(x)
        std = torch.sqrt(x.var(-1, keepdim=True, unbiased=False) + 1e-7
                         ).expand_as(x)
        a = torch.softmax(self.linear2(torch.tanh(
            self.linear1(torch.cat([x, mean, std], 1)))), dim=2)
        mu = (a * x).sum(2)
        var = (a * x * x).sum(2) - mu ** 2
        return torch.cat([mu, torch.sqrt(var.clamp(min=1e-7))], 1)


class ECAPA(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = cfg.spk_channels
        self.layer1 = Conv1dReluBn(cfg.mel_bins, ch, 5, padding=2)
        self.layer2 = SE_Res2Block(ch, 2)
        self.layer3 = SE_Res2Block(ch, 3)
        self.layer4 = SE_Res2Block(ch, 4)
        self.conv = nn.Conv1d(3 * ch, 3 * ch, 1)
        self.pool = ASTP(3 * ch)
        self.bn = nn.BatchNorm1d(6 * ch)
        self.linear = nn.Linear(6 * ch, cfg.spk_out_dim)

    def forward(self, x, return_latent=False):
        h = self.layer1(x)
        o1 = self.layer2(h)
        o2 = self.layer3(h + o1)
        o3 = self.layer4(h + o1 + o2)
        latent = F.relu(self.conv(torch.cat([o1, o2, o3], 1)))
        out = self.linear(self.bn(self.pool(latent)))
        return (out, latent) if return_latent else out


class Attention(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.heads, self.dim_head = heads, dim_head
        inner = heads * dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, 2 * inner, bias=False)
        self.to_out = nn.Linear(inner, dim, bias=False)

    def forward(self, x, context):
        ctx = torch.cat([x, context], dim=1)     # include queries
        B, N, _ = x.shape
        q = self.to_q(x).view(B, N, self.heads, self.dim_head)
        k, v = self.to_kv(ctx).chunk(2, -1)
        M = ctx.shape[1]
        k = k.view(B, M, self.heads, self.dim_head)
        v = v.view(B, M, self.heads, self.dim_head)
        att = torch.einsum("bnhd,bmhd->bhnm", q, k) * self.dim_head ** -0.5
        att = att.softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, -1)
        return self.to_out(out)


class RMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = dim ** 0.5
        self.gamma = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return F.normalize(x, dim=-1) * self.scale * self.gamma


class PerceiverLayer(nn.Module):
    def __init__(self, dim, heads, dim_head):
        super().__init__()
        self.add_module("0", Attention(dim, heads, dim_head))
        self.add_module("1", nn.Sequential(
            nn.Linear(dim, 4 * dim), nn.GELU(), nn.Linear(4 * dim, dim)))


class PerceiverResampler(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        d = cfg.spk_latent_dim
        self.proj_context = nn.Linear(3 * cfg.spk_channels, d)
        self.latents = nn.Parameter(torch.randn(cfg.num_global_tokens, d))
        self.layers = nn.ModuleList(
            [PerceiverLayer(d, cfg.perceiver_heads, cfg.perceiver_dim_head)
             for _ in range(cfg.perceiver_depth)])
        self.norm = RMSNorm(d)

    def forward(self, ctx):                      # ctx [B, T, 3·ch]
        ctx = self.proj_context(ctx)
        lat = self.latents.unsqueeze(0).expand(ctx.shape[0], -1, -1)
        for layer in self.layers:
            lat = getattr(layer, "0")(lat, ctx) + lat
            lat = getattr(layer, "1")(lat) + lat
        return self.norm(lat)


class ResidualFSQ(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.levels = cfg.fsq_levels
        n = len(cfg.fsq_levels)
        self.project_in = nn.Linear(cfg.spk_latent_dim, n)
        self.project_out = nn.Linear(n, cfg.spk_latent_dim)

    def _quant(self, z):
        eps = 1e-3
        lv = torch.tensor(self.levels, dtype=torch.float32)
        half_l = (lv - 1) * (1 + eps) / 2
        offset = torch.where(lv % 2 == 0, torch.tensor(0.5),
                             torch.tensor(0.0))
        q = torch.round(torch.tanh(z + torch.atanh(offset / half_l))
                        * half_l - offset)
        half_w = torch.tensor(self.levels) // 2
        basis = torch.cumprod(torch.tensor((1,) + self.levels[:-1]), 0)
        idx = ((q + half_w) * basis).sum(-1).long()
        return idx, q / half_w

    def tokenize(self, lat):                     # [B, N, D] → [B, N]
        return self._quant(self.project_in(lat))[0]

    def detokenize(self, idx):                   # [B, N] → [B, N, D]
        lv = torch.tensor(self.levels)
        basis = torch.cumprod(torch.tensor((1,) + self.levels[:-1]), 0)
        digits = (idx.unsqueeze(-1) // basis) % lv
        half_w = (lv // 2).float()
        return self.project_out((digits.float() - half_w) / half_w)


class SpeakerEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.speaker_encoder = ECAPA(cfg)
        self.perceiver_sampler = PerceiverResampler(cfg)
        self.quantizer = ResidualFSQ(cfg)
        self.project = nn.Linear(
            cfg.spk_latent_dim * cfg.num_global_tokens, cfg.spk_out_dim)

    def tokenize(self, mel):                     # mel [B, F, T]
        _, latent = self.speaker_encoder(mel, True)
        lat = self.perceiver_sampler(latent.transpose(1, 2))
        return self.quantizer.tokenize(lat)

    def detokenize(self, idx):
        lat = self.quantizer.detokenize(idx)     # [B, N, D]
        flat = lat.transpose(1, 2).reshape(lat.shape[0], -1)  # channel-major
        return self.project(flat)


class Prenet(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.linear_pre = nn.Linear(cfg.encoder_out, cfg.prenet_dim)
        self.downsample = nn.Sequential(*[
            StageSeq(cfg.prenet_dim, cfg.prenet_inter_dim)
            for _ in cfg.prenet_ratios])
        self.vocos_backbone = VocosBackbone(
            cfg.prenet_dim, cfg.prenet_dim, cfg.prenet_inter_dim,
            cfg.prenet_layers, cond_dim=cfg.spk_out_dim)
        self.linear = nn.Linear(cfg.prenet_dim, cfg.encoder_out)

    def forward(self, x, cond):                  # x [B, out, S]
        h = self.linear_pre(x.transpose(1, 2))
        h = self.downsample(h)
        h = self.vocos_backbone(h.transpose(1, 2), cond)
        return self.linear(h).transpose(1, 2)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(dim),
            WNConv1d(dim, dim, 7, dilation=dilation,
                     padding=(7 - 1) * dilation // 2),
            Snake1d(dim),
            WNConv1d(dim, dim, 1))

    def forward(self, x):
        return x + self.block(x)


class DecoderBlock(nn.Module):
    def __init__(self, i, o, rate, k):
        super().__init__()
        self.block = nn.Sequential(
            Snake1d(i),
            WNConvTranspose1d(i, o, k, stride=rate, padding=(k - rate) // 2),
            ResidualUnit(o, 1), ResidualUnit(o, 3), ResidualUnit(o, 9))

    def forward(self, x):
        return self.block(x)


class WaveGenerator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        layers = [WNConv1d(cfg.encoder_out, cfg.dec_channels, 7, padding=3)]
        ch = cfg.dec_channels
        for rate, k in zip(cfg.dec_rates, cfg.dec_kernels):
            layers.append(DecoderBlock(ch, ch // 2, rate, k))
            ch //= 2
        layers += [Snake1d(ch), WNConv1d(ch, 1, 7, padding=3), nn.Tanh()]
        self.model = nn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class TorchBiCodec(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = Encoder(cfg)
        self.quantizer = FactorizedVQ(cfg)
        self.speaker_encoder = SpeakerEncoder(cfg)
        self.prenet = Prenet(cfg)
        self.decoder = WaveGenerator(cfg)

    @torch.no_grad()
    def tokenize(self, feat, mel):               # feat [B,T,F], mel [B,F,T]
        z = self.encoder(feat.transpose(1, 2))
        return self.quantizer.tokenize(z), self.speaker_encoder.tokenize(mel)

    @torch.no_grad()
    def detokenize(self, semantic, global_idx):
        zq = self.quantizer.detokenize(semantic)
        d = self.speaker_encoder.detokenize(global_idx)
        x = self.prenet(zq, d) + d.unsqueeze(-1)
        return self.decoder(x).squeeze(1)



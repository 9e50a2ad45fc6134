"""Fresh torch replicas of the reference subnets, used as numeric oracles.

Written against the reference's *documented* architectures (SURVEY.md 2.2) in
modern torch (align_corners=True where torch-0.2 bilinear semantics apply).
The tests copy memcnet_tpu params into these modules via load_state_dict
(strict=True), so they also verify that our flat param names match the
reference state-dict naming exactly — the contract the .pth importer relies on.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class Up2(nn.Module):
    """torch-0.2 nn.Upsample(scale_factor=2, mode='bilinear')."""

    def __init__(self, scale=2):
        super().__init__()
        self.scale = scale

    def forward(self, x):
        return F.interpolate(x, scale_factor=self.scale, mode="bilinear", align_corners=True)


def conv_relu(cin, cout):
    return [nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU()]


def conv_relu_maxpool(cin, cout, bn=True):
    m = [nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU()]
    if bn:
        m.append(nn.BatchNorm2d(cout))
    m.append(nn.MaxPool2d(2))
    return m


def conv_relu_unpool(cin, cout, bn=True):
    m = [nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU()]
    if bn:
        m.append(nn.BatchNorm2d(cout))
    m.append(Up2())
    return m


def unpool_conv_relu(cin, cout):
    # MEMC_Net_s ordering: Upsample first (MEMC_Net_s.py:312-325)
    return [Up2(), nn.Conv2d(cin, cout, 3, 1, 1), nn.ReLU(), nn.BatchNorm2d(cout)]


def mononet5_modulelist(channel_in, variant="full", bn=True):
    c2 = channel_in * 2
    m = []
    if variant == "full":
        m += conv_relu(c2, 32) + conv_relu(32, 32) + conv_relu_maxpool(32, 32, bn)
        m += conv_relu(32, 64) + conv_relu_maxpool(64, 64, bn)
        m += conv_relu(64, 128) + conv_relu_maxpool(128, 128, bn)
        m += conv_relu(128, 256) + conv_relu_maxpool(256, 256, bn)
        m += conv_relu(256, 512) + conv_relu_maxpool(512, 512, bn)
        m += conv_relu(512, 512) + conv_relu(512, 512)
        m += conv_relu_unpool(512, 512, bn) + conv_relu(512, 256)
        m += conv_relu_unpool(256, 256, bn) + conv_relu(256, 128)
        m += conv_relu_unpool(128, 128, bn) + conv_relu(128, 64)
        m += conv_relu_unpool(64, 64, bn) + conv_relu(64, 32)
        m += conv_relu_unpool(32, 32, bn) + conv_relu(32, 16)
    elif variant == "thin":
        m += conv_relu(c2, 16) + conv_relu_maxpool(16, 32, bn)
        m += conv_relu_maxpool(32, 64, bn)
        m += conv_relu_maxpool(64, 128, bn)
        m += conv_relu_maxpool(128, 256, bn)
        m += conv_relu_maxpool(256, 512, bn)
        m += conv_relu(512, 512)
        m += unpool_conv_relu(512, 256)
        m += unpool_conv_relu(256, 128)
        m += unpool_conv_relu(128, 64)
        m += unpool_conv_relu(64, 32)
        m += unpool_conv_relu(32, 16)
    return nn.ModuleList(m)


def branch_modulelist(channel_out):
    return nn.ModuleList([nn.Conv2d(16, 16, 3, 1, 1), nn.ReLU(), nn.Conv2d(16, channel_out, 3, 1, 1)])


def rectify_modulelist(channel_in):
    m = conv_relu(channel_in, 64)
    for _ in range(6):
        m += conv_relu(64, 64)
    m += [nn.Conv2d(64, 3, 3, 1, 1)]
    return nn.ModuleList(m)


def walk_single_path(modulelist, x):
    """The reference stack-walk (MEMC_Net.py:154-178)."""
    stack = []
    cur = x
    for k, layer in enumerate(modulelist):
        if k == 0:
            cur = layer(cur)
            continue
        if isinstance(layer, (nn.AvgPool2d, nn.MaxPool2d)):
            stack.append(cur)
        cur = layer(cur)
        if isinstance(layer, Up2):
            cur = cur + stack.pop()
    return cur


class TorchFlowNetS(nn.Module):
    def __init__(self):
        super().__init__()

        def conv(cin, cout, k=3, s=1):
            return nn.Sequential(nn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=True), nn.LeakyReLU(0.1))

        def deconv(cin, cout):
            return nn.Sequential(nn.ConvTranspose2d(cin, cout, 4, 2, 1, bias=True), nn.LeakyReLU(0.1))

        self.conv1 = conv(6, 64, 7, 2)
        self.conv2 = conv(64, 128, 5, 2)
        self.conv3 = conv(128, 256, 5, 2)
        self.conv3_1 = conv(256, 256)
        self.conv4 = conv(256, 512, 3, 2)
        self.conv4_1 = conv(512, 512)
        self.conv5 = conv(512, 512, 3, 2)
        self.conv5_1 = conv(512, 512)
        self.conv6 = conv(512, 1024, 3, 2)
        self.conv6_1 = conv(1024, 1024)
        self.deconv5 = deconv(1024, 512)
        self.deconv4 = deconv(1026, 256)
        self.deconv3 = deconv(770, 128)
        self.deconv2 = deconv(386, 64)
        self.predict_flow6 = nn.Conv2d(1024, 2, 3, 1, 1, bias=False)
        self.predict_flow5 = nn.Conv2d(1026, 2, 3, 1, 1, bias=False)
        self.predict_flow4 = nn.Conv2d(770, 2, 3, 1, 1, bias=False)
        self.predict_flow3 = nn.Conv2d(386, 2, 3, 1, 1, bias=False)
        self.predict_flow2 = nn.Conv2d(194, 2, 3, 1, 1, bias=False)
        self.upsampled_flow6_to_5 = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.upsampled_flow5_to_4 = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.upsampled_flow4_to_3 = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)
        self.upsampled_flow3_to_2 = nn.ConvTranspose2d(2, 2, 4, 2, 1, bias=False)

    def forward(self, x):
        out_conv2 = self.conv2(self.conv1(x))
        out_conv3 = self.conv3_1(self.conv3(out_conv2))
        out_conv4 = self.conv4_1(self.conv4(out_conv3))
        out_conv5 = self.conv5_1(self.conv5(out_conv4))
        out_conv6 = self.conv6_1(self.conv6(out_conv5))
        flow6 = self.predict_flow6(out_conv6)
        flow6_up = self.upsampled_flow6_to_5(flow6)
        out_deconv5 = self.deconv5(out_conv6)
        concat5 = torch.cat((out_conv5, out_deconv5, flow6_up), 1)
        flow5 = self.predict_flow5(concat5)
        flow5_up = self.upsampled_flow5_to_4(flow5)
        out_deconv4 = self.deconv4(concat5)
        concat4 = torch.cat((out_conv4, out_deconv4, flow5_up), 1)
        flow4 = self.predict_flow4(concat4)
        flow4_up = self.upsampled_flow4_to_3(flow4)
        out_deconv3 = self.deconv3(concat4)
        concat3 = torch.cat((out_conv3, out_deconv3, flow4_up), 1)
        flow3 = self.predict_flow3(concat3)
        flow3_up = self.upsampled_flow3_to_2(flow3)
        out_deconv2 = self.deconv2(concat3)
        concat2 = torch.cat((out_conv2, out_deconv2, flow3_up), 1)
        return self.predict_flow2(concat2)


class TorchEDSR(nn.Module):
    def __init__(self, n_colors, n_resblocks=10, n_feats=128):
        super().__init__()

        class ResBlock(nn.Module):
            def __init__(self):
                super().__init__()
                self.body = nn.Sequential(
                    nn.Conv2d(n_feats, n_feats, 3, 1, 1), nn.ReLU(),
                    nn.Conv2d(n_feats, n_feats, 3, 1, 1),
                )

            def forward(self, x):
                return x + self.body(x)

        self.head = nn.Sequential(nn.Conv2d(n_colors, n_feats, 3, 1, 1))
        body = [ResBlock() for _ in range(n_resblocks)]
        body.append(nn.Conv2d(n_feats, n_feats, 3, 1, 1))
        self.body = nn.Sequential(*body)
        self.tail = nn.Sequential(nn.Conv2d(n_feats, 3, 3, 1, 1))

    def forward(self, x):
        x = self.head(x)
        res = self.body(x)
        return self.tail(res)  # no global residual (EDSR.py:47 commented)


class TorchSPyNetBasic(nn.Module):
    def __init__(self):
        super().__init__()
        self.moduleBasic = nn.Sequential(
            nn.Conv2d(8, 32, 7, 1, 3), nn.ReLU(),
            nn.Conv2d(32, 64, 7, 1, 3), nn.ReLU(),
            nn.Conv2d(64, 32, 7, 1, 3), nn.ReLU(),
            nn.Conv2d(32, 16, 7, 1, 3), nn.ReLU(),
            nn.Conv2d(16, 2, 7, 1, 3),
        )

    def forward(self, x):
        return self.moduleBasic(x)


class TorchSPyNet(nn.Module):
    def __init__(self):
        super().__init__()
        self.moduleBasic = nn.ModuleList([TorchSPyNetBasic() for _ in range(6)])

    @staticmethod
    def preprocess(x):
        b = (x[:, 0:1] - 0.406) / 0.225
        g = (x[:, 1:2] - 0.456) / 0.224
        r = (x[:, 2:3] - 0.485) / 0.229
        return torch.cat([r, g, b], 1)

    @staticmethod
    def warp(x, flow):
        B, C, H, W = x.shape
        gx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, 1, H, W)
        gy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, 1, H, W)
        grid = torch.cat([gx, gy], 1)
        fl = torch.cat([flow[:, 0:1] / ((W - 1) / 2.0), flow[:, 1:2] / ((H - 1) / 2.0)], 1)
        return F.grid_sample(x, (grid + fl).permute(0, 2, 3, 1), mode="bilinear",
                             padding_mode="zeros", align_corners=True)

    def forward(self, first, second):
        import math

        firsts = [self.preprocess(first)]
        seconds = [self.preprocess(second)]
        for _ in range(5):
            if firsts[0].size(2) > 32 or firsts[0].size(3) > 32:
                firsts.insert(0, F.avg_pool2d(firsts[0], 2))
                seconds.insert(0, F.avg_pool2d(seconds[0], 2))
        flow = torch.zeros(first.size(0), 2, int(math.floor(firsts[0].size(2) / 2.0)),
                           int(math.floor(firsts[0].size(3) / 2.0)))
        for lvl in range(len(firsts)):
            up = F.interpolate(flow, scale_factor=2, mode="bilinear", align_corners=True) * 2.0
            if up.size(2) != firsts[lvl].size(2):
                up = F.pad(up, [0, 0, 0, 1], "replicate")
            if up.size(3) != firsts[lvl].size(3):
                up = F.pad(up, [0, 1, 0, 0], "replicate")
            flow = self.moduleBasic[lvl](torch.cat([firsts[lvl], self.warp(seconds[lvl], up), up], 1)) + up
        return flow
